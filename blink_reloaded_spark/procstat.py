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

    Keys: ``busy`` (everything except idle+iowait), ``steal`` (cycles the
    hypervisor ran someone else while this VM was runnable — the direct
    core-steal signal when present), ``iowait``."""
    tick = os.sysconf("SC_CLK_TCK")
    with open("/proc/stat") as f:
        fields = [int(x) for x in f.readline().split()[1:]]
    # user nice system idle iowait irq softirq steal guest guest_nice
    idle, iowait = fields[3], fields[4]
    steal = fields[7] if len(fields) > 7 else 0
    return {
        "busy": (sum(fields) - idle - iowait) / tick,
        "steal": steal / tick,
        "iowait": iowait / tick,
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
