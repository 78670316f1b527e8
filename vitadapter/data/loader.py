"""Threaded batch prefetching.

The reference trains with a multi-worker torch DataLoader; the TPU loop is a
single python process, so without overlap the host-side decode/augment time
(`data_time`) adds directly to every step. `prefetch` runs the batch
iterator in worker threads and keeps a bounded queue of ready batches —
PIL/numpy release the GIL for the heavy ops, so threads are enough to hide
the pipeline behind device compute (no process pool / pickling needed).
"""

import queue
import threading
from typing import Iterator


class _EndOfData:
    pass


def prefetch(make_iter, num_threads: int = 4, buffer: int = 8,
             seed: int = 0) -> Iterator:
    """Pull batches from `num_threads` independent iterators into a bounded
    queue. `make_iter(seed)` must return an infinite batch iterator; each
    thread gets a distinct seed so the streams don't duplicate batches.

    For finite iterators use `num_threads=1` (order within a thread is
    preserved; across threads it is interleaved).
    """
    q: "queue.Queue" = queue.Queue(maxsize=buffer)
    stop = threading.Event()

    def work(tid: int):
        try:
            for item in make_iter(seed + tid):
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        finally:
            q.put(_EndOfData())

    threads = [threading.Thread(target=work, args=(t,), daemon=True)
               for t in range(num_threads)]
    for t in threads:
        t.start()

    ended = 0
    try:
        while ended < num_threads:
            item = q.get()
            if isinstance(item, _EndOfData):
                ended += 1
                continue
            yield item
    finally:
        stop.set()
        # drain so producer threads blocked on put() can observe stop
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
