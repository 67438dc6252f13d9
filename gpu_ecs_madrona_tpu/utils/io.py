"""Async IO manager — background asset loading.

Counterpart of reference include/madrona/io.hpp + src/common/io.cpp (an
async file-read job skeleton on the legacy job system).  Here: a small
thread pool (IO is GIL-releasing) with future handles; used to overlap
.obj/asset loading with jit compilation at startup.
"""

from __future__ import annotations

import concurrent.futures


class IOManager:
    """reference IOManager (io.hpp:21-35): load() returns a promise."""

    def __init__(self, num_workers: int = 4):
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=num_workers, thread_name_prefix="gem-io")

    def load(self, path: str) -> "concurrent.futures.Future[bytes]":
        """Async whole-file read (reference IOPromise/load)."""

        def read():
            with open(path, "rb") as f:
                return f.read()

        return self._pool.submit(read)

    def load_obj(self, path: str):
        """Async .obj parse through the native importer."""

        def work():
            from gpu_ecs_madrona_tpu.utils import importer

            return importer.load_obj(path)

        return self._pool.submit(work)

    def shutdown(self):
        self._pool.shutdown(wait=True)
