"""Per-record time budgets inside vectorized UDFs.

Role parity: the reference wraps every worker's per-record process()
in a SIGALRM-based timeout and emits a `timeout` status row instead
of letting one pathological document stall the consumer
(/root/reference/python/sandcrawler/workers.py:56-83, and the ingest
hop budget ingest.py:450-457).

Spark shape: Python UDF workers execute batches on the worker
process's main thread, so SIGALRM is usable exactly like the
reference's worker loop. `record_budget(seconds)` arms an interval
timer around one record's parse; on expiry the parse raises
RecordTimeout, the caller emits its timeout row, and the batch
continues. On platforms/threads without signal support the guard
degrades to a no-op (documented: the budget is best-effort, the
batch contract — one output row per input row — always holds).
"""

from __future__ import annotations

import signal
import threading
from contextlib import contextmanager


class RecordTimeout(Exception):
    """Raised inside a guarded section when the record budget expires."""


# Gate for late alarm delivery: the handler only raises while a budget
# window is armed. An alarm that fires after the guarded body completed
# but before setitimer(0) lands (the disarm race) is dropped here
# instead of surfacing as a bogus timeout for a record that parsed fine.
_GATE = [False]


def _alarm_handler(signum, frame):  # pragma: no cover - signal path
    if _GATE[0]:
        raise RecordTimeout()
    # Late alarm in the disarm window: swallow.


@contextmanager
def record_budget(seconds: float):
    """Context manager: raise RecordTimeout if the body runs longer
    than `seconds`. No-op when not on the main thread (signals can
    only be delivered there) or when seconds is falsy.

    NOT reentrant: a nested record_budget replaces the outer timer and
    does not rearm it on exit — guard one record at a time (which is
    how the batch loops use it)."""
    if not seconds or threading.current_thread() is not threading.main_thread():
        yield
        return
    old = signal.signal(signal.SIGALRM, _alarm_handler)
    _GATE[0] = True
    signal.setitimer(signal.ITIMER_REAL, seconds)
    body_done = False
    try:
        try:
            yield
            body_done = True
        finally:
            _GATE[0] = False
            signal.setitimer(signal.ITIMER_REAL, 0)
            signal.signal(signal.SIGALRM, old)
    except RecordTimeout:
        if not body_done:
            raise
        # Alarm was delivered in the one-instruction window between the
        # body completing and the gate closing: the record succeeded,
        # drop the late timeout.
