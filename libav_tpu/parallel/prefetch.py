"""Input reader thread + bounded packet queue (reference: avconv.c:2386
input_thread / ff_thread_message_queue — each input file gets a reader
thread so demux/IO overlaps decode; here it also overlaps the host
entropy stage with device reconstruction)."""

from __future__ import annotations

import queue
import threading

from libav_tpu.avutil.error import AVError, EOF_

_SENTINEL = object()


class PacketPrefetcher:
    """Iterate packets of a FormatContext from a background reader
    thread through a bounded queue (default depth matches the
    reference's DEFAULT_THREAD_QUEUE_SIZE=8 scaled up for bursty
    device-bound consumers)."""

    def __init__(self, ic, depth: int = 32):
        self.ic = ic
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._reader, daemon=True,
                                   name="avconv-input-reader")
        self._t.start()

    def _reader(self):
        try:
            while not self._stop.is_set():
                try:
                    pkt = self.ic.read_frame()
                except AVError as e:
                    if e.code != EOF_:
                        self._err = e
                    break
                self.q.put(pkt)
        finally:
            self.q.put(_SENTINEL)

    def __iter__(self):
        while True:
            pkt = self.q.get()
            if pkt is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield pkt

    def close(self):
        self._stop.set()
        # unblock a full queue so the reader can exit
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self._t.join(timeout=2.0)
