"""One-shot worker thread wrapper.

Parity with the reference AsyncTask (include/remote_ui/AsyncTask.hpp:13-66):
run a callable on a secondary thread, `wait_for_completion` joins and
rethrows. The render loop uses it to overlap UI encode/send with the next
frame's device work, the reference's double-buffering pattern
(src/main/splat.cpp:207-225,280-283).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional


class AsyncTask:
    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def run(self, fn: Callable[[], None]) -> None:
        if self._thread is not None and self._thread.is_alive():
            raise RuntimeError("AsyncTask already running; "
                               "call wait_for_completion first")
        self._exc = None

        def wrapper():
            try:
                fn()
            except BaseException as e:  # rethrown on join
                self._exc = e

        self._thread = threading.Thread(target=wrapper, daemon=True)
        self._thread.start()

    def wait_for_completion(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
