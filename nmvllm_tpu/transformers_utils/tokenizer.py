"""Tokenizer resolution + offline fallback.

Reference surface: vllm/transformers_utils/tokenizer.py (get_tokenizer) and
tokenizer_group/. When the model is a built-in preset or the HF hub is
unreachable, a self-contained byte-level tokenizer is used so the engine,
tests, and benchmarks run with zero network access.
"""
import os
from typing import List, Optional

from nmvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class ByteTokenizer:
    """Byte-level tokenizer: one token per UTF-8 byte, plus special tokens.

    vocab layout: [0..255] raw bytes, 256=<bos>, 257=<eos>, 258=<pad>,
    259=<unk>; ids >= 260 decode to "".
    """

    vocab_base = 256

    def __init__(self, vocab_size: int = 512):
        self._vocab_size = max(vocab_size, 260)
        self.bos_token_id = 256
        self.eos_token_id = 257
        self.pad_token_id = 258
        self.unk_token_id = 259
        self.all_special_ids = [256, 257, 258, 259]
        self.bos_token = "<bos>"
        self.eos_token = "<eos>"
        self.pad_token = "<pad>"
        self.name_or_path = "byte-tokenizer"
        self.is_fast = True

    @property
    def vocab_size(self) -> int:
        return self._vocab_size

    def __len__(self) -> int:
        return self._vocab_size

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        ids = list(text.encode("utf-8"))
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        data = bytearray()
        for i in ids:
            i = int(i)
            if i < 256:
                data.append(i)
            elif not skip_special_tokens and i in (256, 257, 258, 259):
                data.extend({256: b"<bos>", 257: b"<eos>", 258: b"<pad>",
                             259: b"<unk>"}[i])
        return data.decode("utf-8", errors="replace")

    def convert_ids_to_tokens(self, ids, skip_special_tokens: bool = False):
        single = False
        if isinstance(ids, int):
            ids, single = [ids], True
        toks = []
        for i in ids:
            i = int(i)
            if i < 256:
                toks.append(chr(i) if 32 <= i < 127 else f"<0x{i:02X}>")
            else:
                toks.append({256: "<bos>", 257: "<eos>", 258: "<pad>"}.get(
                    i, "<unk>"))
        return toks[0] if single else toks

    def convert_tokens_to_string(self, tokens: List[str]) -> str:
        out = bytearray()
        for t in tokens:
            if t.startswith("<0x") and t.endswith(">"):
                out.append(int(t[3:-1], 16))
            elif t in ("<bos>", "<eos>", "<pad>", "<unk>"):
                continue
            else:
                out.extend(t.encode("utf-8"))
        return out.decode("utf-8", errors="replace")

    def get_added_vocab(self):
        return {}

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True, **kw):
        # Minimal ChatML-style template for the fallback tokenizer.
        parts = []
        for m in messages:
            content = m["content"] if isinstance(m, dict) else m.content
            role = m["role"] if isinstance(m, dict) else m.role
            parts.append(f"<|{role}|>\n{content}\n")
        if add_generation_prompt:
            parts.append("<|assistant|>\n")
        text = "".join(parts)
        return self.encode(text) if tokenize else text


def get_tokenizer(tokenizer_name: str,
                  tokenizer_mode: str = "auto",
                  trust_remote_code: bool = False,
                  revision: Optional[str] = None,
                  **kwargs):
    """Resolve a tokenizer; degrade to ByteTokenizer when offline."""
    from nmvllm_tpu.transformers_utils.config import _PRESETS
    if tokenizer_name.lower() in _PRESETS:
        cfg = _PRESETS[tokenizer_name.lower()]()
        # Multimodal configs nest the decoder vocab under text_config.
        shape = getattr(cfg, "text_config", None) or cfg
        return ByteTokenizer(vocab_size=shape.vocab_size)
    if os.path.isdir(tokenizer_name):
        try:
            from transformers import AutoTokenizer
            return AutoTokenizer.from_pretrained(
                tokenizer_name, trust_remote_code=trust_remote_code, **kwargs)
        except Exception as e:
            logger.warning("Failed to load tokenizer from %s (%s); "
                           "falling back to ByteTokenizer.", tokenizer_name, e)
            return ByteTokenizer()
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(
            tokenizer_name, trust_remote_code=trust_remote_code,
            revision=revision, **kwargs)
    except Exception as e:
        logger.warning("Failed to load tokenizer %r (%s); falling back to "
                       "ByteTokenizer.", tokenizer_name, e)
        return ByteTokenizer()
