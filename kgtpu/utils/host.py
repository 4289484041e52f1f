"""Host-process self-monitoring: RSS tracking + leak-surviving restart.

[SURVEY.md §5 failure recovery]

Why this exists: the reference assumes a healthy host; long training runs
here go through a remote-TPU tunnel whose client leaks host memory at a
steady per-dispatch rate (measured ~15 MB/step at batch 8 / input 512 —
the kgtpu step/data path itself holds RSS flat over hundreds of steps on
the CPU backend, so the leak is in the transport, not this code).  A
multi-hour run therefore gets OOM-killed mid-schedule.  Rather than lose
the run, train.py checks host RSS at every epoch boundary and, past a
limit, flushes a checkpoint and re-execs itself with ``--resume`` — the
fresh process starts with a clean heap and continues the same schedule
with zero lost epochs.
"""

from __future__ import annotations

import os
import sys

__all__ = ["host_rss_gb", "default_rss_limit_gb", "restart_argv"]


def host_rss_gb() -> float:
    """Current resident-set size of this process, in GB (decimal)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except (OSError, IndexError, ValueError):  # non-Linux fallback: disable
        return 0.0


def default_rss_limit_gb() -> float:
    """75% of MemTotal — past this, an epoch-boundary restart is cheaper
    than risking the kernel OOM killer mid-epoch (which loses every epoch
    since the last ``--save_every`` checkpoint)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) * 1024 * 0.75 / 1e9
    except (OSError, IndexError, ValueError):
        pass
    return 0.0  # unknown total -> watchdog disabled


def restart_argv(argv: list[str]) -> list[str]:
    """argv for the re-exec'd process: same run, but resuming.

    Ensures exactly one bare ``--resume`` (resume-latest from --save_dir);
    an explicit ``--resume <path>`` from the original invocation is
    rewritten to the bare form, because the *latest* checkpoint — written
    moments before the restart — now supersedes the original source.
    """
    out, skip = [], False
    for a in argv:
        if skip:  # value attached to a previous --resume
            skip = False
            if not a.startswith("-"):
                continue
        if a == "--resume":
            skip = True
            continue
        if a.startswith("--resume="):
            continue
        out.append(a)
    return out + ["--resume"]


def reexec(argv: list[str]) -> None:
    """Replace this process with a fresh interpreter running `argv`."""
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + argv)
