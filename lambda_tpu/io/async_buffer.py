"""Async input buffer: single-producer bounded prefetch over a record
iterator.

TPU-host equivalent of the reference's ``views::async_input_buffer``
(``/root/reference/src/view_async_input_buffer.hpp:37-463``): a producer
thread reads ahead into a bounded queue so disk/decompression overlaps
the device pipeline (SURVEY.md §2.2 P3).  Used by ``--lazy-query``.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def async_input_buffer(source: Iterable[T], capacity: int = 256) -> Iterator[T]:
    """Iterate ``source`` on a daemon producer thread through a bounded
    queue of ``capacity`` records.  Exceptions raised by the producer are
    re-raised in the consumer."""
    q: queue.Queue = queue.Queue(maxsize=max(1, capacity))
    err: list[BaseException] = []

    def produce():
        try:
            for item in source:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=produce, name="lambda-input-producer",
                         daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
