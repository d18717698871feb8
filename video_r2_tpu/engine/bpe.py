"""Byte-level BPE tokenizer: GPT-2/Qwen-style vocab.json + merges.txt,
with the merge loop in native C++ (native/bpe.cpp via ctypes) and a pure
Python fallback with identical semantics.

Loads the same tokenizer files the HF fast tokenizer reads, so a real Qwen
checkpoint directory works without the `tokenizers` Rust wheel. Special
tokens are longest-match pre-split (added_tokens / specials dict).
"""

from __future__ import annotations

import ctypes
import functools
import json
import os
import re
import subprocess
from pathlib import Path

# GPT-2 byte-level pretokenization (Qwen uses the same contractions-aware
# pattern family). Python re lacks \p{}; this approximation covers ASCII +
# treats all non-ascii letters as word chars via str.isalpha at merge level.
_PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[^\s\d\W_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+",
    re.UNICODE)


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte<->unicode visible mapping."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _native_lib_path() -> Path:
    return Path(__file__).resolve().parents[2] / "native" / "libbpe.so"


def _build_native() -> Path | None:
    src = Path(__file__).resolve().parents[2] / "native" / "bpe.cpp"
    out = _native_lib_path()
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(out)],
            check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


class _NativeBPE:
    def __init__(self, lib_path: Path):
        lib = ctypes.CDLL(str(lib_path))
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_new.argtypes = []
        lib.bpe_free.restype = None
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_add_symbol.restype = ctypes.c_int32
        lib.bpe_add_symbol.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int32]
        lib.bpe_add_merge.restype = ctypes.c_int32
        lib.bpe_add_merge.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_char_p, ctypes.c_int32]
        lib.bpe_encode.restype = ctypes.c_int32
        lib.bpe_encode.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int32),
                                   ctypes.c_int32,
                                   ctypes.POINTER(ctypes.c_int32),
                                   ctypes.c_int32]
        lib.bpe_encode_batch.restype = ctypes.c_int32
        lib.bpe_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        self._lib = lib
        self._h = lib.bpe_new()
        self._sym_idx: dict[str, int] = {}

    def add_symbol(self, text: str, vocab_id: int) -> int:
        idx = self._lib.bpe_add_symbol(self._h, text.encode(), vocab_id)
        self._sym_idx[text] = idx
        return idx

    def add_merge(self, left: str, right: str, rank: int) -> int:
        return self._lib.bpe_add_merge(self._h, left.encode(), right.encode(),
                                       rank)

    def encode_symbols(self, symbols: list[str]) -> list[int]:
        n = len(symbols)
        arr = (ctypes.c_int32 * n)(*[self._sym_idx[s] for s in symbols])
        cap = n
        out = (ctypes.c_int32 * cap)()
        cnt = self._lib.bpe_encode(self._h, arr, n, out, cap)
        if cnt < 0:
            raise RuntimeError("bpe_encode overflow")
        return list(out[:cnt])

    def encode_pieces(self, pieces: list[list[int]]) -> list[int]:
        """One native call for many pieces (flattened symbol indices)."""
        flat: list[int] = []
        offsets = [0]
        for p in pieces:
            flat.extend(p)
            offsets.append(len(flat))
        n = len(flat)
        arr = (ctypes.c_int32 * n)(*flat)
        offs = (ctypes.c_int32 * len(offsets))(*offsets)
        out = (ctypes.c_int32 * n)()
        out_offs = (ctypes.c_int32 * len(offsets))()
        cnt = self._lib.bpe_encode_batch(self._h, arr, offs, len(pieces),
                                         out, n, out_offs)
        if cnt < 0:
            raise RuntimeError("bpe_encode_batch overflow")
        return list(out[:cnt])

    def __del__(self):
        try:
            self._lib.bpe_free(self._h)
        except Exception:
            pass


class BPETokenizer:
    """vocab.json + merges.txt tokenizer with native/python merge engines."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 specials: dict[str, int] | None = None,
                 use_native: bool = True):
        self.vocab = vocab
        self.specials = dict(specials or {})
        self.id_to_token = {v: k for k, v in vocab.items()}
        self.id_to_token.update({v: k for k, v in self.specials.items()})
        self.byte_map = bytes_to_unicode()
        self.byte_unmap = {v: k for k, v in self.byte_map.items()}
        self.merge_ranks = {pair: i for i, pair in enumerate(merges)}

        self._native = None
        if use_native:
            lib = _build_native()
            if lib is not None:
                native = _NativeBPE(lib)
                for tok, tid in vocab.items():
                    native.add_symbol(tok, tid)
                for i, (a, b) in enumerate(merges):
                    native.add_merge(a, b, i)
                self._native = native

        self.eos_token_id = self.specials.get("<|im_end|>",
                                              self.specials.get("<|endoftext|>", 0))
        self.pad_token_id = self.specials.get("<|endoftext|>", 0)
        self._special_re = (re.compile("|".join(
            re.escape(s) for s in sorted(self.specials, key=len, reverse=True)))
            if self.specials else None)

    # -- loading ----------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str | Path, use_native: bool = True):
        path = Path(path)
        vocab = json.load(open(path / "vocab.json"))
        merges = []
        with open(path / "merges.txt") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                a, b = line.split(" ")
                merges.append((a, b))
        specials = {}
        added = path / "added_tokens.json"
        if added.exists():
            specials.update(json.load(open(added)))
        tok_cfg = path / "tokenizer_config.json"
        if tok_cfg.exists():
            cfg = json.load(open(tok_cfg))
            for tid, info in (cfg.get("added_tokens_decoder") or {}).items():
                specials[info["content"]] = int(tid)
        return cls(vocab, merges, specials, use_native=use_native)

    # -- encoding ---------------------------------------------------------
    def _bpe_python(self, symbols: list[str]) -> list[str]:
        word = list(symbols)
        while len(word) > 1:
            best, best_i = None, -1
            for i in range(len(word) - 1):
                r = self.merge_ranks.get((word[i], word[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            word[best_i: best_i + 2] = [word[best_i] + word[best_i + 1]]
        return word

    def _encode_piece(self, piece: str) -> list[int]:
        symbols = [self.byte_map[b] for b in piece.encode("utf-8")]
        if not symbols:
            return []
        if self._native is not None:
            try:
                return self._native.encode_symbols(symbols)
            except KeyError:
                pass  # symbol outside vocab (shouldn't happen for bytes)
        merged = self._bpe_python(symbols)
        return [self.vocab[m] for m in merged]

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        segments = ([(text, False)] if self._special_re is None
                    else self._split_specials(text))
        for seg, is_special in segments:
            if is_special:
                ids.append(self.specials[seg])
                continue
            pieces = _PRETOKEN_RE.findall(seg)
            if self._native is not None:
                sym_pieces = [[self._native._sym_idx[self.byte_map[b]]
                               for b in piece.encode("utf-8")]
                              for piece in pieces]
                ids.extend(self._native.encode_pieces(sym_pieces))
            else:
                for piece in pieces:
                    ids.extend(self._encode_piece(piece))
        return ids

    def _split_specials(self, text: str):
        out = []
        pos = 0
        for m in self._special_re.finditer(text):
            if m.start() > pos:
                out.append((text[pos: m.start()], False))
            out.append((m.group(0), True))
            pos = m.end()
        if pos < len(text):
            out.append((text[pos:], False))
        return out

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        special_ids = set(self.specials.values())
        out: list[str] = []
        byte_buf: list[str] = []

        def flush():
            if byte_buf:
                data = bytes(self.byte_unmap[c] for c in byte_buf
                             if c in self.byte_unmap)
                out.append(data.decode("utf-8", errors="replace"))
                byte_buf.clear()

        for t in (int(x) for x in ids):
            tok = self.id_to_token.get(t)
            if tok is None:
                continue
            if t in special_ids:
                flush()
                if not skip_special_tokens:
                    out.append(tok)
            else:
                byte_buf.extend(tok)
        flush()
        return "".join(out)
