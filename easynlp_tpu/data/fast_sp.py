"""ctypes wrapper for the native SentencePiece unigram encoder
(native/sp_unigram.cpp). Byte-parity fast path for
SentencePieceModel._encode_unigram — normalization (charsmap/NFKC) stays in
Python, the Viterbi hot loop runs native."""

import ctypes
import os

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "native_lib", "libsp_unigram.so")
    if not os.path.exists(path):
        src_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "native")
        if os.path.exists(os.path.join(src_dir, "Makefile")):
            import subprocess
            subprocess.run(["make", "-C", src_dir], capture_output=True)
    if not os.path.exists(path):
        _LIB = False
        return False
    lib = ctypes.CDLL(path)
    lib.spu_create.restype = ctypes.c_void_p
    lib.spu_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.spu_destroy.argtypes = [ctypes.c_void_p]
    lib.spu_encode.restype = ctypes.c_int64
    lib.spu_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                               ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_int32),
                               ctypes.c_int64]
    _LIB = lib
    return lib


class FastUnigram:
    """Native engine built from a SentencePieceModel's tables. Returns None
    from create() when unavailable (caller keeps the Python path)."""

    def __init__(self, handle, lib):
        self._handle = handle
        self._lib = lib

    @classmethod
    def create(cls, model):
        if os.environ.get("EASYNLP_FAST_TOKENIZER", "1") != "1":
            return None
        lib = _load_lib()
        if not lib:
            return None
        from easynlp_tpu.modelzoo.tokenization_sentencepiece import (
            NORMAL, UNK_PENALTY, USER_DEFINED)
        pieces = model.pieces
        blob_parts = []
        for i, (p, _s, _t) in enumerate(pieces):
            keep = model.piece_to_id.get(p) == i and \
                pieces[i][2] in (NORMAL, USER_DEFINED)
            if keep and "\n" in p:
                return None  # cannot express in the newline blob
            blob_parts.append(p.encode("utf-8") if keep else b"")
        blob = b"\n".join(blob_parts)
        scores = np.ascontiguousarray(
            [s for _, s, _ in pieces], dtype=np.float64)
        byte_ids = np.full((256,), model.unk_id, np.int32)
        has_bytes = model._byte_ids is not None
        if has_bytes:
            for b, i in model._byte_ids.items():
                byte_ids[b] = i
        handle = lib.spu_create(
            blob, len(blob), len(pieces),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_double(model._min_score - UNK_PENALTY),
            model.unk_id,
            byte_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            1 if has_bytes else 0)
        if not handle:
            return None
        return cls(handle, lib)

    def encode(self, normalized_text):
        data = normalized_text.encode("utf-8")
        cap = max(16, 2 * len(data) + 8)
        out = (ctypes.c_int32 * cap)()
        n = self._lib.spu_encode(self._handle, data, len(data), out, cap)
        if n < 0:
            return None
        return [int(out[i]) for i in range(n)]

    def __del__(self):
        try:
            if self._handle and self._lib:
                self._lib.spu_destroy(self._handle)
        except Exception:
            pass
