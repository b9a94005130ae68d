"""Tokenizer loading with an offline-deterministic fallback.

The reference uses transformers' CLIPTokenizer fetched from the HF hub
(reference run.py:28 via from_pretrained). This environment may have no
network, so:

  * ``load_tokenizer(path)`` uses transformers.CLIPTokenizer from a local
    checkpoint dir when available;
  * otherwise ``SimpleTokenizer`` provides a deterministic word-level
    tokenizer with the same interface and CLIP's framing (BOS=49406,
    EOS=49407, context 77, EOS-padding) so that token binding, guidance
    specs, tests, and benchmarks exercise identical code paths.
"""
from __future__ import annotations

import hashlib
from typing import List, Optional

BOS = 49406
EOS = 49407
CONTEXT = 77


class SimpleTokenizer:
    """Deterministic whitespace tokenizer with CLIP-style framing.

    Word -> id via stable hash into [0, 49000); multi-word strings produce
    one token per word, mirroring how CLIP usually splits common words.
    """

    model_max_length = CONTEXT

    def encode(self, text: str) -> List[int]:
        words = [w for w in text.strip().lower().split() if w]
        ids = [BOS]
        for w in words:
            h = int(hashlib.md5(w.encode()).hexdigest(), 16) % 49000
            ids.append(h + 1)  # avoid 0
        ids.append(EOS)
        return ids[:CONTEXT]

    def __call__(self, text: str, padding: Optional[str] = None, **kw):
        ids = self.encode(text)
        if padding == "max_length" or kw.get("max_length"):
            ids = ids + [EOS] * (CONTEXT - len(ids))
        return {"input_ids": ids}

    def pad_to_context(self, ids: List[int]) -> List[int]:
        return (ids + [EOS] * CONTEXT)[:CONTEXT]

    def decode(self, ids) -> str:
        if isinstance(ids, int):
            ids = [ids]
        out = []
        for i in ids:
            if i == BOS:
                out.append("<|startoftext|>")
            elif i == EOS:
                out.append("<|endoftext|>")
            else:
                out.append(f"tok{int(i)}")
        return " ".join(out)


def load_tokenizer(model_path: Optional[str] = None):
    """CLIPTokenizer from a local dir if possible, else SimpleTokenizer."""
    if model_path is not None:
        try:
            from transformers import CLIPTokenizer

            return CLIPTokenizer.from_pretrained(model_path, subfolder="tokenizer")
        except Exception:
            try:
                from transformers import CLIPTokenizer

                return CLIPTokenizer.from_pretrained(model_path)
            except Exception:
                pass
    return SimpleTokenizer()


def pad_ids(tokenizer, text: str, length: int = CONTEXT) -> List[int]:
    """Tokenize + EOS-pad to fixed context length."""
    ids = list(tokenizer.encode(text))[:length]
    pad_id = EOS
    if hasattr(tokenizer, "pad_token_id") and tokenizer.pad_token_id is not None:
        pad_id = tokenizer.pad_token_id
    return ids + [pad_id] * (length - len(ids))
