"""JSON-schema -> regex conversion for guided_json.

Reference behavior: outlines' build_regex_from_schema as used by
vllm/model_executor/guided_decoding/outlines_decoding.py. Supports the
common schema subset: type object/array/string/number/integer/boolean/null,
enum/const, properties (+required), nested schemas, anyOf/oneOf, string
minLength/maxLength/pattern, array minItems/maxItems, $ref to #/$defs and
#/definitions. Whitespace is emitted compactly (one optional space after
``:`` and ``,``) — same policy as outlines.
"""
import json as _json
import re as _re
from typing import Any, Dict, Optional

_STRING_INNER = r'([^"\\\x00-\x1f]|\\(["\\/bfnrt]|u[0-9a-fA-F]{4}))'
STRING_RE = f'"{_STRING_INNER}*"'
INTEGER_RE = r"(-)?(0|[1-9]\d*)"
NUMBER_RE = r"(-)?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?"
BOOLEAN_RE = r"(true|false)"
NULL_RE = r"null"
WS = r"[ ]?"


def _escape_literal(s: str) -> str:
    """Regex-escape a JSON-encoded literal string."""
    out = []
    for ch in s:
        if ch in r"\^$.|?*+()[]{}":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _resolve_ref(ref: str, root: Dict[str, Any]) -> Dict[str, Any]:
    if not ref.startswith("#/"):
        raise ValueError(f"only local $refs are supported, got {ref}")
    node: Any = root
    for part in ref[2:].split("/"):
        node = node[part]
    return node


def to_regex(schema: Dict[str, Any], root: Optional[Dict[str, Any]] = None,
             depth: int = 0) -> str:
    if root is None:
        root = schema
    if depth > 32:
        raise ValueError("schema nesting too deep")
    if not isinstance(schema, dict) or schema == {}:
        return json_value_regex()

    if "$ref" in schema:
        return to_regex(_resolve_ref(schema["$ref"], root), root, depth + 1)
    if "const" in schema:
        return _escape_literal(_json.dumps(schema["const"]))
    if "enum" in schema:
        opts = [_escape_literal(_json.dumps(v)) for v in schema["enum"]]
        return "(" + "|".join(opts) + ")"
    for key in ("anyOf", "oneOf"):
        if key in schema:
            opts = [to_regex(s, root, depth + 1) for s in schema[key]]
            return "(" + "|".join(opts) + ")"

    stype = schema.get("type")
    if isinstance(stype, list):
        opts = [to_regex({**schema, "type": t}, root, depth + 1)
                for t in stype]
        return "(" + "|".join(opts) + ")"
    if stype == "string":
        if "pattern" in schema:
            inner = schema["pattern"]
            inner = inner.lstrip("^").rstrip("$")
            return f'"{inner}"'
        lo = schema.get("minLength")
        hi = schema.get("maxLength")
        if lo is not None or hi is not None:
            lo = lo or 0
            quant = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
            return f'"{_STRING_INNER}{quant}"'
        return STRING_RE
    if stype == "integer":
        return INTEGER_RE
    if stype == "number":
        return NUMBER_RE
    if stype == "boolean":
        return BOOLEAN_RE
    if stype == "null":
        return NULL_RE
    if stype == "array":
        item = schema.get("items", {})
        item_re = (to_regex(item, root, depth + 1) if item
                   else json_value_regex())
        min_items = schema.get("minItems", 0)
        max_items = schema.get("maxItems")
        if max_items is None:
            rest = f"({WS},{WS}{item_re})*"
            if min_items > 1:
                rest = (f"({WS},{WS}{item_re}){{{min_items - 1},}}")
            body = f"{item_re}{rest}"
            if min_items == 0:
                body = f"({body})?"
            return rf"\[{WS}{body}{WS}\]"
        if max_items == 0:
            return rf"\[{WS}\]"
        rest = (f"({WS},{WS}{item_re})"
                f"{{{max(0, min_items - 1)},{max_items - 1}}}")
        body = f"{item_re}{rest}"
        if min_items == 0:
            body = f"({body})?"
        return rf"\[{WS}{body}{WS}\]"
    if stype == "object" or "properties" in schema:
        props = schema.get("properties", {})
        required = schema.get("required")
        if not props:
            return json_object_regex()
        keys = list(props.keys())
        required = set(required) if required is not None else set(keys)
        parts = []
        for k in keys:
            key_re = _escape_literal(_json.dumps(k))
            val_re = to_regex(props[k], root, depth + 1)
            parts.append((k in required, f"{key_re}{WS}:{WS}{val_re}"))
        # Build the member list: required members joined by commas;
        # optional members get an optional comma-prefixed group. A fully
        # optional object is wrapped once more.
        pieces = []
        seen_required = False
        for is_req, part in parts:
            if is_req:
                if seen_required:
                    pieces.append(f"{WS},{WS}{part}")
                else:
                    pieces.append(part)
                    seen_required = True
            else:
                if seen_required:
                    pieces.append(f"({WS},{WS}{part})?")
                else:
                    # Optional member before any required one: outlines
                    # emits it with a trailing comma baked in.
                    pieces.append(f"({part}{WS},{WS})?")
        body = "".join(pieces)
        if not seen_required:
            # All-optional: approximate with each member optional,
            # comma-joined pairs handled above; allow empty object.
            opt_parts = [p for _, p in parts]
            body = "(" + "|".join(
                f"{p}({WS},{WS}({'|'.join(opt_parts)}))*"
                for p in opt_parts) + ")?"
        return rf"\{{{WS}{body}{WS}\}}"
    return json_value_regex()


def json_value_regex(max_depth: int = 4) -> str:
    """A depth-bounded regex for an arbitrary JSON value (JSON is not
    regular; outlines' json_object mode similarly bounds recursion)."""
    leaf = f"({STRING_RE}|{NUMBER_RE}|{BOOLEAN_RE}|{NULL_RE})"
    value = leaf
    for _ in range(max_depth):
        arr = rf"\[{WS}({value}({WS},{WS}{value})*)?{WS}\]"
        obj = (rf"\{{{WS}({STRING_RE}{WS}:{WS}{value}"
               rf"({WS},{WS}{STRING_RE}{WS}:{WS}{value})*)?{WS}\}}")
        value = f"({leaf}|{arr}|{obj})"
    return value


def json_object_regex(max_depth: int = 4) -> str:
    value = json_value_regex(max_depth)
    return (rf"\{{{WS}({STRING_RE}{WS}:{WS}{value}"
            rf"({WS},{WS}{STRING_RE}{WS}:{WS}{value})*)?{WS}\}}")


def schema_to_regex(schema) -> str:
    if isinstance(schema, str):
        schema = _json.loads(schema)
    elif hasattr(schema, "model_json_schema"):
        schema = schema.model_json_schema()
    return to_regex(schema)
