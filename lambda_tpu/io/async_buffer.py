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
    re-raised in the consumer.  If the consumer abandons the generator
    early (error mid-pipeline, GC), the producer notices a stop flag and
    exits, closing ``source`` — without this it would block forever in
    ``q.put()`` holding the input file handle open."""
    q: queue.Queue = queue.Queue(maxsize=max(1, capacity))
    err: list[BaseException] = []
    stop = threading.Event()

    def produce():
        it = iter(source)
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            close = getattr(it, "close", None)
            if close is not None:
                close()
            # sentinel must reach a live consumer; a departed consumer
            # sets `stop`, releasing this loop
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=produce, name="lambda-input-producer",
                         daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
