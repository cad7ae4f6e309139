"""Q12: user-pluggable in-flight progress for long-running stages.

The reference throttles percent callbacks from inside its compile/parse
loops (utility.py:186-191, 449-454: report only when the integer percent
moves). A Spark stage has no user code on the driver while it runs, so the
idiomatic equivalent is an **accumulator + driver poll thread**: the Arrow
kernels add processed-row counts to a Spark accumulator (updates ship with
task completion — granularity = one task, exactly the unit of distributed
progress), and a daemon thread on the driver samples it, applying the same
throttle (percent moved, plus a wall-clock floor) before invoking the user
callback. Works identically in local and cluster mode; zero cost on the
executors beyond one counter add per Arrow batch.

Usage::

    with ProgressReporter(spark, cb, total=n_rows, label="mentions") as p:
        extract_mentions_df(df, model, progress=p).write...

``cb`` receives ``(label, done, total, pct)``; ``pct`` is None when
``total`` is unknown (callback then fires on row-count deltas). A final
call with the closing counts always fires on exit.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional

ProgressCallback = Callable[[str, int, Optional[int], Optional[int]], None]


class ProgressReporter:
    """Throttled in-flight progress over a Spark accumulator.

    ``min_interval``: wall-clock floor between callbacks (seconds);
    ``min_delta_pct``: integer-percent movement required to fire (the
    reference's throttle); with unknown ``total``, ``min_delta_rows``
    gates instead.
    """

    def __init__(
        self,
        spark,
        callback: ProgressCallback,
        total: Optional[int] = None,
        label: str = "",
        min_interval: float = 1.0,
        min_delta_pct: int = 1,
        min_delta_rows: int = 10_000,
        poll_interval: float = 0.2,
    ) -> None:
        self.acc = spark.sparkContext.accumulator(0)
        self._callback = callback
        self.total = total
        self.label = label
        self._min_interval = min_interval
        self._min_delta_pct = min_delta_pct
        self._min_delta_rows = min_delta_rows
        self._poll = poll_interval
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._last_report = (-1, 0.0)  # (pct-or-rows, wall time)

    # executor side: kernels capture ``self.acc`` (picklable) and call add()

    def _maybe_report(self, done: int, force: bool = False) -> None:
        now = time.time()
        last_val, last_t = self._last_report
        if self.total:
            pct = min(100, int(100 * done / self.total))
            moved = pct - last_val >= self._min_delta_pct
        else:
            pct = None
            moved = done - last_val >= self._min_delta_rows
        if force or (moved and now - last_t >= self._min_interval):
            self._callback(self.label, done, self.total, pct)
            self._last_report = (pct if self.total else done, now)

    def _run(self) -> None:
        while not self._stop.wait(self._poll):
            self._maybe_report(int(self.acc.value))

    def __enter__(self) -> "ProgressReporter":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self._maybe_report(int(self.acc.value), force=True)  # closing report
