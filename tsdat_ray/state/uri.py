"""URI-addressable storage layer for writers + manifest.

The round-1 fast writer hard-coded POSIX paths (os.makedirs/os.replace),
which on a real multi-node cluster without shared NFS would scatter tier
partitions across worker-local disks.  This wraps ``pyarrow.fs`` so every
write path accepts ``file://``, ``s3://``, ``gs://``-style roots (parity with
the reference's FileSystemS3 —
/root/reference/tsdat/io/storage/file_system_s3.py:24+) while keeping the
measured POSIX fast path (atomic tmp+rename publish) for plain local paths.

Atomicity model: local filesystems publish via tmp-file + ``os.replace``
(a torn file can never be observed under a final name); object stores get
single-request PUTs, which are already atomic at the object level — no
rename needed or possible.
"""

from __future__ import annotations

import os
import posixpath
import re

_URI_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def is_uri(root: str) -> bool:
    return bool(_URI_RE.match(root))


class StorageFS:
    """Minimal filesystem facade: plain paths use os.* (fast path, atomic
    rename); URIs go through ``pyarrow.fs.FileSystem.from_uri``.  ``file://``
    URIs resolve to a LocalFileSystem but still publish atomically.  Every
    method accepts either fs-form paths (``self.join``) or root-form URIs
    (``self.join_root``) — URIs are normalized to fs-form on entry."""

    def __init__(self, root: str):
        self.root = root.rstrip("/") if is_uri(root) else root
        if is_uri(root):
            from pyarrow import fs as pafs

            self.fs, self.path = pafs.FileSystem.from_uri(root)
            self.local = isinstance(self.fs, pafs.LocalFileSystem)
            # "file:///tmp/x" → fs path "/tmp/x", prefix "file://"
            self.prefix = self.root[: len(self.root) - len(self.path)]
        else:
            self.fs, self.path = None, root
            self.local = True
            self.prefix = ""

    def _n(self, p: str) -> str:
        """Normalize a root-form (URI) path to the fs-form this FS expects."""
        return p[len(self.prefix):] if self.prefix and p.startswith(self.prefix) else p

    # -------------------------------------------------------------- paths
    def join(self, *parts: str) -> str:
        """fs-form join (for use with this object's own methods)."""
        return (os.path.join if self.fs is None else posixpath.join)(self.path, *parts)

    def join_root(self, *parts: str) -> str:
        """Root-form join: keeps the URI scheme, so the result works with
        ``ray.data.read_parquet`` / ``StorageFS(...)`` round-trips."""
        if self.fs is None:
            return os.path.join(self.root, *parts)
        return "/".join((self.root, *parts))

    # ---------------------------------------------------------- directories
    def makedirs(self, path: str) -> None:
        path = self._n(path)
        if self.fs is None:
            os.makedirs(path, exist_ok=True)
        else:
            self.fs.create_dir(path, recursive=True)

    def listdir(self, path: str) -> list[str]:
        """Names of immediate children (files and dirs); [] if absent."""
        path = self._n(path)
        if self.fs is None:
            return sorted(os.listdir(path)) if os.path.isdir(path) else []
        from pyarrow import fs as pafs

        try:
            infos = self.fs.get_file_info(pafs.FileSelector(path, recursive=False))
        except (FileNotFoundError, OSError):
            return []
        return sorted(posixpath.basename(i.path) for i in infos)

    def isdir(self, path: str) -> bool:
        path = self._n(path)
        if self.fs is None:
            return os.path.isdir(path)
        from pyarrow import fs as pafs

        return self.fs.get_file_info(path).type == pafs.FileType.Directory

    def rmtree(self, path: str) -> None:
        path = self._n(path)
        if self.fs is None:
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        else:
            self.fs.delete_dir(path)

    def rmdir_if_empty(self, path: str) -> None:
        path = self._n(path)
        if self.fs is None:
            if os.path.isdir(path) and not os.listdir(path):
                os.rmdir(path)
        elif self.isdir(path) and not self.listdir(path):
            self.fs.delete_dir(path)

    # --------------------------------------------------------------- files
    def exists(self, path: str) -> bool:
        path = self._n(path)
        if self.fs is None:
            return os.path.exists(path)
        from pyarrow import fs as pafs

        return self.fs.get_file_info(path).type != pafs.FileType.NotFound

    def remove_file(self, path: str) -> None:
        path = self._n(path)
        if self.fs is None:
            if os.path.exists(path):
                os.remove(path)
        else:
            from pyarrow import fs as pafs

            if self.fs.get_file_info(path).type != pafs.FileType.NotFound:
                self.fs.delete_file(path)

    def rename(self, src: str, dst: str) -> None:
        """Atomic-on-local rename (os.replace); remote FS uses move()."""
        src, dst = self._n(src), self._n(dst)
        if self.fs is None:
            os.replace(src, dst)
        else:
            self.fs.move(src, dst)

    def getsize(self, path: str) -> int:
        path = self._n(path)
        if self.fs is None:
            return os.path.getsize(path)
        return self.fs.get_file_info(path).size

    def write_table_atomic(self, table, path: str, compression: str = "snappy") -> None:
        """Publish a parquet file so a final name is never torn: local →
        tmp + os.replace; remote FS → direct write (object PUT is atomic)."""
        import pyarrow.parquet as pq

        path = self._n(path)
        if self.fs is None:
            tmp = f"{path}.tmp{os.getpid()}"
            pq.write_table(table, tmp, compression=compression)
            os.replace(tmp, path)
        else:
            pq.write_table(table, path, compression=compression, filesystem=self.fs)

    def write_text(self, path: str, text: str) -> None:
        path = self._n(path)
        if self.fs is None:
            with open(path, "w") as f:
                f.write(text)
        else:
            with self.fs.open_output_stream(path) as f:
                f.write(text.encode())

    def write_bytes(self, path: str, data: bytes, atomic: bool = True) -> None:
        """Publish raw bytes; local writes go through tmp+rename when
        ``atomic`` (same torn-file guarantee as parquet publishes)."""
        path = self._n(path)
        if self.fs is None:
            if atomic:
                tmp = f"{path}.tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)
            else:
                with open(path, "wb") as f:
                    f.write(data)
        else:
            with self.fs.open_output_stream(path) as f:
                f.write(data)

    def read_bytes(self, path: str) -> bytes:
        path = self._n(path)
        if self.fs is None:
            with open(path, "rb") as f:
                return f.read()
        with self.fs.open_input_stream(path) as f:
            return f.read()

    def read_text(self, path: str) -> str:
        path = self._n(path)
        if self.fs is None:
            with open(path) as f:
                return f.read()
        with self.fs.open_input_stream(path) as f:
            return f.read().decode()

    def append_line(self, path: str, line: str) -> None:
        """Append one record line.  Local: O_APPEND + fsync (atomic at the
        record level).  Remote: pyarrow's append stream when the FS supports
        it, else read-modify-write (manifest appends happen only on the
        driver, serially, so RMW has no concurrent writers)."""
        path = self._n(path)
        if self.fs is None:
            with open(path, "a") as f:
                f.write(line)
                f.flush()
                os.fsync(f.fileno())
            return
        try:
            with self.fs.open_append_stream(path) as f:
                f.write(line.encode())
        except (NotImplementedError, OSError):
            prev = self.read_text(path) if self.exists(path) else ""
            with self.fs.open_output_stream(path) as f:
                f.write((prev + line).encode())

    def parquet_num_rows(self, path: str) -> int:
        import pyarrow.parquet as pq

        path = self._n(path)
        if self.fs is None:
            return pq.ParquetFile(path).metadata.num_rows
        with self.fs.open_input_file(path) as f:
            return pq.ParquetFile(f).metadata.num_rows
