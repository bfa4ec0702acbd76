"""ctypes wrapper for the native C++ WordPiece tokenizer
(native/wordpiece_tokenizer.cpp). Drop-in fast path for BertTokenizer's
tokenize+convert (the featurisation hot loop); falls back to the pure-Python
implementation when the shared library is absent or inputs need the rare
accent-stripping path."""

import ctypes
import os
import unicodedata

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "native_lib", "libwordpiece.so")
    if not os.path.exists(path):
        # attempt build from source
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
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
                              ctypes.c_char_p]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_encode.restype = ctypes.c_int64
    lib.wp_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_int32),
                              ctypes.c_int64]
    if hasattr(lib, "wp_set_classes"):
        lib.wp_set_classes.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int64]
    _LIB = lib
    return lib


_CLASS_TABLE = None
_CLASS_TABLE_LIMIT = 0x30000  # planes 0-2 cover every practical Zs/Cc/Cf/P*


def _char_class_table():
    """Per-codepoint class flags (1=whitespace, 2=control, 4=punct) derived
    from unicodedata, so the native pipeline splits exactly like the
    pure-Python one (reference _is_whitespace/_is_control/_is_punctuation:
    Zs / Cc,Cf / ASCII-nonalnum + P*)."""
    global _CLASS_TABLE
    if _CLASS_TABLE is not None:
        return _CLASS_TABLE
    table = bytearray(_CLASS_TABLE_LIMIT)
    for cp in range(_CLASS_TABLE_LIMIT):
        ch = chr(cp)
        cat = unicodedata.category(ch)
        flags = 0
        if ch in " \t\n\r" or cat == "Zs":
            flags |= 1
        elif cat in ("Cc", "Cf"):
            flags |= 2
        if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
                or 123 <= cp <= 126 or cat.startswith("P")):
            flags |= 4
        table[cp] = flags
    _CLASS_TABLE = bytes(table)
    return _CLASS_TABLE


def available():
    return bool(_load_lib())


class FastWordPiece:
    """Native tokenizer over a vocab.txt; API: encode(text) -> list[int]."""

    def __init__(self, vocab_file, do_lower_case=True, unk_token="[UNK]",
                 strip_accents=None, max_ids=512):
        lib = _load_lib()
        if not lib:
            raise RuntimeError("libwordpiece.so unavailable "
                               "(run `make -C native/`)")
        self._lib = lib
        with open(vocab_file, "rb") as f:
            data = f.read()
        self._handle = lib.wp_create(data, len(data), int(do_lower_case),
                                     unk_token.encode())
        if hasattr(lib, "wp_set_classes"):
            tbl = _char_class_table()
            lib.wp_set_classes(self._handle, tbl, len(tbl))
        self.do_lower_case = do_lower_case
        self.strip_accents = strip_accents
        self.max_ids = max_ids
        self._buf = (ctypes.c_int32 * max_ids)()

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.wp_destroy(self._handle)

    def _normalize(self, text):
        # Lowercasing + accent stripping are the unicode-table-heavy steps;
        # pre-apply in Python (only when non-ASCII present) for byte parity —
        # the native side only lowercases ASCII A-Z.
        if not text.isascii():
            if self.do_lower_case:
                text = text.lower()
            if (self.do_lower_case and self.strip_accents is not False) \
                    or self.strip_accents:
                text = unicodedata.normalize("NFD", text)
                text = "".join(ch for ch in text
                               if unicodedata.category(ch) != "Mn")
        return text

    def encode(self, text):
        data = self._normalize(text).encode("utf-8")
        n = self._lib.wp_encode(self._handle, data, len(data), self._buf,
                                self.max_ids)
        return list(self._buf[:n])

    def encode_batch(self, texts):
        return [self.encode(t) for t in texts]
