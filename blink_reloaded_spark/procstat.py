"""Process-tree CPU accounting for benchmark metrics (VERDICT r4 #2: the
sandbox's wall-clock scaling numbers are neighbor-load-dominated; CPU time
is the better quantity but NOT fully noise-immune: it is core-steal-immune
— another tenant taking our cores inflates wall, not our billed CPU — but
it is NOT bus-steal-immune. Cycles stalled on the shared memory bus bill as
CPU time, so a host-neighbor bus storm inflates our CPU counters on
identical work (measured in CPU_CONTENTION.json: kernel CPU inflates
~2.5x from 2 to 8 concurrent workers on this box, and recheck runs show
bimodal trials_cpu on unchanged code). Treat cross-window CPU comparisons
with the same suspicion as wall; only same-window interleaved pairs
control for it — see scripts/bench_scaling.py's paired estimator.

`tree_cpu_seconds()` sums utime+stime (+reaped-children cutime/cstime) over
the calling process and every live descendant — the Spark driver JVM AND
the Python UDF workers, which Spark's own executorCpuTime metric does NOT
include (a large share of this engine's work runs in Arrow-batched Python).
Sampling the counter before and after a job gives the job's CPU cost.

Caveat (documented, acceptable for deltas): CPU burned by a descendant that
exits AND is reaped by an intermediate parent between samples is folded
into that parent's cutime at reap time, so deltas remain correct; only a
descendant that dies un-reaped mid-window under-counts. Spark's daemon /
worker processes live for the session, so steady-state deltas are stable.
"""

from __future__ import annotations

import os


def _read_stats() -> dict[int, tuple[int, int]]:
    """pid -> (ppid, total jiffies incl. reaped children)."""
    out: dict[int, tuple[int, int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                st = f.read()
        except OSError:  # raced with process exit
            continue
        # fields after the parenthesized comm (which may contain spaces)
        rp = st.rindex(")")
        fields = st[rp + 2:].split()
        ppid = int(fields[1])
        jiffies = (
            int(fields[11]) + int(fields[12])  # utime + stime
            + int(fields[13]) + int(fields[14])  # cutime + cstime (reaped)
        )
        out[int(p)] = (ppid, jiffies)
    return out


def system_cpu_sample() -> dict[str, float]:
    """Box-wide cumulative CPU seconds from the aggregate ``cpu`` line of
    /proc/stat (which, in this sandbox, is the HOST view — it includes
    other tenants' cycles that never appear in our pid namespace's process
    list). Used by scripts/bench_scaling.py as a per-trial load covariate:
    (busy-delta − our process-tree CPU) / wall ≈ cores consumed by
    off-container neighbors during the trial window.

    Keys: ``busy`` (user+nice+system+irq+softirq — NOT sum-minus-idle,
    which double-counts guest/guest_nice (Linux folds guest time into
    user/nice already) and folds steal into busy, overstating the
    covariate on hosts that report those fields — ADVICE r6), ``steal``
    (cycles the hypervisor ran someone else while this VM was runnable —
    the direct core-steal signal, reported separately), ``iowait``."""
    tick = os.sysconf("SC_CLK_TCK")
    with open("/proc/stat") as f:
        fields = [int(x) for x in f.readline().split()[1:]]
    # user nice system idle iowait irq softirq steal guest guest_nice
    def _f(i: int) -> int:
        return fields[i] if len(fields) > i else 0

    busy = _f(0) + _f(1) + _f(2) + _f(5) + _f(6)
    return {
        "busy": busy / tick,
        "steal": _f(7) / tick,
        "iowait": _f(4) / tick,
    }


def tree_cpu_seconds(root_pid: int | None = None) -> float:
    """Total CPU seconds (user+system) consumed by `root_pid` (default: the
    calling process) and all its live descendants, plus already-reaped
    children folded into their parents' counters."""
    tick = os.sysconf("SC_CLK_TCK")
    stats = _read_stats()
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in stats.items():
        children.setdefault(ppid, []).append(pid)
    total = 0
    stack = [root_pid or os.getpid()]
    while stack:
        pid = stack.pop()
        if pid in stats:
            total += stats[pid][1]
            stack.extend(children.get(pid, []))
    return total / tick


# ---------------------------------------------------------------------------
# fixed-work canary (VERDICT r6 #1/#2: the off-container busy-core covariate
# is blind to BUS steal — another tenant saturating the shared memory bus
# shows zero busy cores in our /proc view yet inflates every memory-bound
# cycle we bill. A fixed-work probe is not blind: its wall time IS the
# box-health measurement.)
# ---------------------------------------------------------------------------

_CANARY_WORDS = 1 << 25  # 256 MiB of float64 — far larger than LLC, so the
#                          streaming sum is memory-bandwidth-bound: sensitive
#                          to bus pressure AND to core-steal (fixed work
#                          descheduled = longer wall), the two nuisances the
#                          scaling/bench artifacts need to see per-trial
_canary_buf = None


def canary_seconds(passes: int = 8) -> float:
    """Wall seconds for a FIXED amount of single-threaded, memory-streaming
    work (`passes` full sums over a 256 MiB float64 buffer, ~0.25 s on this
    box when quiet). Identical work every call, so the ratio of two samples
    is a direct box-slowdown factor; min-over-a-campaign is the healthy
    reference. The buffer is allocated once per process (allocation/fault-in
    cost is excluded from every sample, including the first)."""
    global _canary_buf
    import time

    import numpy as np

    if _canary_buf is None:
        _canary_buf = np.arange(_CANARY_WORDS, dtype=np.float64)
        _canary_buf.sum()  # fault the pages in before the first timing
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(passes):
        acc += float(_canary_buf.sum())
    dt = time.perf_counter() - t0
    assert acc != 0.0  # keep the loop un-elidable
    return round(dt, 4)


_canary_mt_bufs = None


def canary_mt_seconds(threads: int = 4, passes: int = 16) -> float:
    """Multi-stream variant of `canary_seconds` (r7): `threads` Python
    threads each streaming-sum their own 128 MiB buffer `passes` times
    concurrently (numpy releases the GIL, so the streams genuinely overlap).
    Rationale: one sequential stream consumes only a fraction of the bus, so
    a neighbor eating PART of the bandwidth leaves the single-thread canary
    unmoved (observed: campaign-c pair 2's @8 CPU read 726s vs the 486s
    quiet floor while the canary sat at 0.24) — several concurrent streams
    demand a larger share and feel partial saturation. DIAGNOSTIC column
    only: on a core-pinned worker the threads also contend for the pinned
    cores, so samples are comparable within one (level, process) only —
    never across parallelism levels, never inside an estimator."""
    global _canary_mt_bufs
    import threading
    import time

    import numpy as np

    if _canary_mt_bufs is None:
        _canary_mt_bufs = [
            np.arange(_CANARY_WORDS >> 1, dtype=np.float64)
            for _ in range(threads)
        ]
        for b in _canary_mt_bufs:
            b.sum()  # fault pages in before the first timing
    acc = [0.0] * threads

    def _work(i: int) -> None:
        s = 0.0
        for _ in range(passes):
            s += float(_canary_mt_bufs[i].sum())
        acc[i] = s

    ts = [threading.Thread(target=_work, args=(i,)) for i in range(threads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0
    assert all(a != 0.0 for a in acc)  # keep the work un-elidable
    return round(dt, 4)
