"""Minimal asyncio HTTP/1.1 server with SSE streaming.

The reference serves OpenAI routes via FastAPI/uvicorn
(vllm/entrypoints/openai/api_server.py); this framework provides the same
surface (JSON routes + server-sent-event streaming + chunked transfer) on
the standard library only, so the serving layer has zero web-framework
dependencies.
"""
import asyncio
import json
import re
import socket
from typing import (Any, AsyncIterator, Awaitable, Callable, Dict, Optional,
                    Tuple)

from nmvllm_tpu.logger import init_logger

logger = init_logger(__name__)

MAX_BODY = 100 * 1024 * 1024


class Request:
    def __init__(self, method: str, path: str, headers: Dict[str, str],
                 body: bytes, query: Dict[str, str]):
        self.method = method
        self.path = path
        self.headers = headers
        self.body = body
        self.query = query

    def json(self) -> Any:
        if not self.body:
            return None
        return json.loads(self.body)


class Response:
    def __init__(self, status: int = 200, body: Any = None,
                 content_type: str = "application/json",
                 headers: Optional[Dict[str, str]] = None):
        self.status = status
        self.headers = headers or {}
        self.content_type = content_type
        if body is None:
            self.body = b""
        elif isinstance(body, bytes):
            self.body = body
        elif isinstance(body, str):
            self.body = body.encode()
        else:
            self.body = json.dumps(body).encode()


class StreamingResponse:
    """SSE / chunked streaming response; `generator` yields str or bytes."""

    def __init__(self, generator: AsyncIterator,
                 content_type: str = "text/event-stream"):
        self.generator = generator
        self.content_type = content_type


Handler = Callable[[Request], Awaitable[Any]]

_STATUS_TEXT = {200: "OK", 400: "Bad Request", 401: "Unauthorized",
                404: "Not Found", 405: "Method Not Allowed",
                422: "Unprocessable Entity", 500: "Internal Server Error",
                503: "Service Unavailable"}


class HTTPServer:

    def __init__(self, host: str = "0.0.0.0", port: int = 8000,
                 api_key: str = ""):
        self.host = host
        self.port = port
        self.api_key = api_key
        self.routes: Dict[Tuple[str, str], Handler] = {}
        self._server: Optional[asyncio.AbstractServer] = None

    def route(self, method: str, path: str):
        def deco(fn: Handler):
            self.routes[(method.upper(), path)] = fn
            return fn
        return deco

    async def _read_request(self, reader: asyncio.StreamReader
                            ) -> Optional[Request]:
        try:
            request_line = await reader.readline()
        except (ConnectionResetError, asyncio.IncompleteReadError):
            return None
        if not request_line:
            return None
        try:
            method, target, _version = request_line.decode().split(" ", 2)
        except ValueError:
            return None
        headers: Dict[str, str] = {}
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            if b":" in line:
                k, v = line.decode().split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        if length > MAX_BODY:
            return None
        body = await reader.readexactly(length) if length else b""
        path, _, qs = target.partition("?")
        query = {}
        for pair in qs.split("&"):
            if "=" in pair:
                k, v = pair.split("=", 1)
                query[k] = v
        return Request(method.upper(), path, headers, body, query)

    def _auth_ok(self, request: Request) -> bool:
        if not self.api_key:
            return True
        auth = request.headers.get("authorization", "")
        return auth == f"Bearer {self.api_key}"

    async def _write_response(self, writer: asyncio.StreamWriter,
                              resp: Response) -> None:
        status_text = _STATUS_TEXT.get(resp.status, "Unknown")
        head = [f"HTTP/1.1 {resp.status} {status_text}",
                f"Content-Type: {resp.content_type}",
                f"Content-Length: {len(resp.body)}",
                "Connection: keep-alive"]
        for k, v in resp.headers.items():
            head.append(f"{k}: {v}")
        writer.write(("\r\n".join(head) + "\r\n\r\n").encode())
        writer.write(resp.body)
        await writer.drain()

    async def _write_streaming(self, writer: asyncio.StreamWriter,
                               resp: StreamingResponse) -> None:
        head = ("HTTP/1.1 200 OK\r\n"
                f"Content-Type: {resp.content_type}\r\n"
                "Cache-Control: no-cache\r\n"
                "Connection: keep-alive\r\n"
                "Transfer-Encoding: chunked\r\n\r\n")
        writer.write(head.encode())
        await writer.drain()
        async for chunk in resp.generator:
            data = chunk.encode() if isinstance(chunk, str) else chunk
            writer.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            await writer.drain()
        writer.write(b"0\r\n\r\n")
        await writer.drain()

    async def _handle_conn(self, reader: asyncio.StreamReader,
                           writer: asyncio.StreamWriter) -> None:
        try:
            while True:
                request = await self._read_request(reader)
                if request is None:
                    break
                handler = self.routes.get((request.method, request.path))
                if handler is None:
                    await self._write_response(
                        writer, Response(404, {"error": "Not Found"}))
                    continue
                if not self._auth_ok(request):
                    await self._write_response(
                        writer, Response(401, {"error": "Unauthorized"}))
                    continue
                try:
                    result = await handler(request)
                except Exception as e:  # noqa: BLE001
                    logger.exception("Handler error for %s %s",
                                     request.method, request.path)
                    result = Response(500, {"error": {
                        "message": str(e), "type": type(e).__name__}})
                if isinstance(result, StreamingResponse):
                    await self._write_streaming(writer, result)
                elif isinstance(result, Response):
                    await self._write_response(writer, result)
                else:
                    await self._write_response(writer, Response(200, result))
        except (ConnectionResetError, asyncio.IncompleteReadError,
                BrokenPipeError):
            pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    async def serve(self) -> None:
        self._server = await asyncio.start_server(
            self._handle_conn, self.host, self.port,
            reuse_address=True)
        logger.info("HTTP server listening on %s:%d", self.host, self.port)
        async with self._server:
            await self._server.serve_forever()

    async def start(self) -> None:
        self._server = await asyncio.start_server(
            self._handle_conn, self.host, self.port, reuse_address=True)
        logger.info("HTTP server listening on %s:%d", self.host, self.port)

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
