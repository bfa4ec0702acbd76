"""ctypes wrapper for the native mmap TSV reader (native/tsv_reader.cpp) —
the common_io.TableReader equivalent (reference appzoo/dataset.py:69-134)."""

import ctypes
import os

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "native_lib", "libtsv_reader.so")
    if not os.path.exists(path):
        _LIB = False
        return False
    lib = ctypes.CDLL(path)
    lib.tsv_open.restype = ctypes.c_void_p
    lib.tsv_open.argtypes = [ctypes.c_char_p]
    lib.tsv_num_rows.restype = ctypes.c_int64
    lib.tsv_num_rows.argtypes = [ctypes.c_void_p]
    lib.tsv_row.restype = ctypes.c_int64
    lib.tsv_row.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
                            ctypes.c_int64]
    lib.tsv_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available():
    return bool(_load_lib())


class NativeTSVReader:
    """mmap-backed random-access row reader with worker slicing."""

    def __init__(self, path, max_row_bytes=1 << 20):
        lib = _load_lib()
        if not lib:
            raise RuntimeError("libtsv_reader.so unavailable "
                               "(run `make -C native/`)")
        self._lib = lib
        self._handle = lib.tsv_open(str(path).encode())
        if not self._handle:
            raise IOError("cannot open %s" % path)
        self._buf = ctypes.create_string_buffer(max_row_bytes)
        self._max = max_row_bytes

    def __len__(self):
        return self._lib.tsv_num_rows(self._handle)

    def __getitem__(self, idx):
        n = self._lib.tsv_row(self._handle, int(idx), self._buf, self._max)
        if n < 0:
            raise IndexError(idx)
        return self._buf.raw[:n].decode("utf-8", errors="replace")

    def rows(self, start=0, stop=None, step=1):
        stop = len(self) if stop is None else stop
        for i in range(start, stop, step):
            yield self[i]

    def close(self):
        if self._handle:
            self._lib.tsv_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
