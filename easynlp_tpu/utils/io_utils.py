"""Pluggable IO layer.

Capability parity: reference easynlp/utils/io_utils.py — an `IO` interface
(:39), local `DefaultIO` (:134), Alibaba-cloud `OSSIO`/`TFOSSIO` backends
(:279-739), and a process-wide `io` singleton swapped with `set_io` (:922-942).
Cloud SDKs are not available in this environment, so OSSIO is an explicit stub
that raises with a clear message; everything in the framework goes through
this seam so a real backend can be dropped in.
"""

import glob as glob_module
import os
import shutil


class IO:
    """Interface all backends implement. Paths are strings; scheme prefixes
    ('oss://', 'odps://') select the backend in the composite singleton."""

    def open(self, path, mode="r", **kw):
        raise NotImplementedError

    def exists(self, path):
        raise NotImplementedError

    def isdir(self, path):
        raise NotImplementedError

    def isfile(self, path):
        raise NotImplementedError

    def listdir(self, path):
        raise NotImplementedError

    def makedirs(self, path, exist_ok=True):
        raise NotImplementedError

    def glob(self, pattern):
        raise NotImplementedError

    def remove(self, path):
        raise NotImplementedError

    def rmtree(self, path):
        raise NotImplementedError

    def copy(self, src, dst):
        raise NotImplementedError

    def copytree(self, src, dst):
        raise NotImplementedError

    def size(self, path):
        raise NotImplementedError

    def read(self, path, mode="r"):
        with self.open(path, mode) as f:
            return f.read()

    def write(self, data, path, mode="w"):
        with self.open(path, mode) as f:
            f.write(data)

    def readlines(self, path):
        with self.open(path) as f:
            return f.readlines()


class DefaultIO(IO):
    """Local filesystem backend."""

    def open(self, path, mode="r", **kw):
        if "b" not in mode:
            kw.setdefault("encoding", "utf-8")
        return open(path, mode, **kw)

    def exists(self, path):
        return os.path.exists(path)

    def isdir(self, path):
        return os.path.isdir(path)

    def isfile(self, path):
        return os.path.isfile(path)

    def listdir(self, path):
        return sorted(os.listdir(path))

    def makedirs(self, path, exist_ok=True):
        os.makedirs(path, exist_ok=exist_ok)

    def glob(self, pattern):
        return sorted(glob_module.glob(pattern))

    def remove(self, path):
        os.remove(path)

    def rmtree(self, path):
        shutil.rmtree(path, ignore_errors=True)

    def copy(self, src, dst):
        shutil.copy(src, dst)

    def copytree(self, src, dst):
        shutil.copytree(src, dst, dirs_exist_ok=True)

    def size(self, path):
        return os.path.getsize(path)


class OSSIO(IO):
    """Alibaba OSS backend stub. The oss2 SDK is not in this environment; this
    class preserves the seam (reference io_utils.py:279-635) so deployments
    with OSS credentials can subclass/replace it via set_io()."""

    def __init__(self, *a, **kw):
        raise RuntimeError(
            "OSS backend requires the oss2 SDK which is not available here; "
            "install it and call easynlp_tpu.utils.io_utils.set_io(OSSIO(...))")


class _CompositeIO(IO):
    """Routes by scheme; local by default. Remote schemes raise until a remote
    backend is registered."""

    def __init__(self):
        self.local = DefaultIO()
        self.backends = {}

    def register(self, scheme, backend):
        self.backends[scheme] = backend

    def _route(self, path):
        for scheme, backend in self.backends.items():
            if str(path).startswith(scheme):
                return backend
        if str(path).startswith(("oss://", "odps://")):
            raise RuntimeError(
                "No IO backend registered for remote path %r "
                "(register one with io.register(scheme, backend))" % path)
        return self.local

    def open(self, path, mode="r", **kw):
        return self._route(path).open(path, mode, **kw)

    def exists(self, path):
        return self._route(path).exists(path)

    def isdir(self, path):
        return self._route(path).isdir(path)

    def isfile(self, path):
        return self._route(path).isfile(path)

    def listdir(self, path):
        return self._route(path).listdir(path)

    def makedirs(self, path, exist_ok=True):
        return self._route(path).makedirs(path, exist_ok=exist_ok)

    def glob(self, pattern):
        return self._route(pattern).glob(pattern)

    def remove(self, path):
        return self._route(path).remove(path)

    def rmtree(self, path):
        return self._route(path).rmtree(path)

    def copy(self, src, dst):
        # cross-backend copy via streaming
        src_io, dst_io = self._route(src), self._route(dst)
        if src_io is dst_io:
            return src_io.copy(src, dst)
        with src_io.open(src, "rb") as fin, dst_io.open(dst, "wb") as fout:
            shutil.copyfileobj(fin, fout)

    def copytree(self, src, dst):
        return self._route(src).copytree(src, dst)

    def size(self, path):
        return self._route(path).size(path)


io = _CompositeIO()


def set_io(new_io):
    """Swap the process-wide IO singleton (reference io_utils.py:922-942)."""
    global io
    io = new_io
    return io
