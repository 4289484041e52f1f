"""Live test of tools/tpu_watch_resume.sh (SURVEY.md §5 failure recovery).

Exercises the round-5 stall-detection path end-to-end with real processes:
a fake trainer wedges (writes one log line then sleeps forever), the
watcher must detect the silent log while the (shimmed) TPU probe succeeds,
kill the trainer's PROCESS GROUP (so the wedge's own child dies with it),
relaunch it, and exit 0 once the relaunched trainer finalizes model_FINAL.

The watcher's `probe_tpu` runs `timeout 180 python -c "import jax..."`;
the test prepends a PATH shim so `python` is an instant `exit 0` — the
probe is genuinely executed, just against a stub interpreter.  Timing uses
the script's parameterized knobs (KGTPU_WATCH_STALL_S / _TICK_S /
_GRACE_S) at second scale, so the whole test runs in ~15 s instead of the
production 60 s tick + minutes-scale stall threshold; it runs real
subprocesses, never matches by name, and cleans up by PID.
"""

import os
import signal
import subprocess
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
WATCHER = REPO / "tools" / "tpu_watch_resume.sh"


def _write(path: Path, text: str) -> None:
    path.write_text(text)
    path.chmod(0o755)


def test_stall_kill_and_resume(tmp_path):
    save_dir = tmp_path / "run"
    save_dir.mkdir()
    log = tmp_path / "train.log"
    attempts = tmp_path / "attempts"
    sleep_pid = tmp_path / "sleep.pid"

    # PATH shim: the watcher's probe_tpu calls `python -c "import jax..."`.
    shim = tmp_path / "bin"
    shim.mkdir()
    _write(shim / "python", "#!/bin/sh\nexit 0\n")

    # Fake trainer: attempt 1 wedges (one log line, then a long-sleeping
    # CHILD process — its pid is recorded so the test can prove the group
    # kill reaped it, not just the top-level bash); the relaunch finalizes
    # the checkpoint dir and exits 0.  Checkpoint creation is mkdir (orbax
    # finalization is an atomic rename; the watcher only checks directory
    # existence).
    trainer = tmp_path / "trainer.sh"
    _write(
        trainer,
        f"""#!/bin/bash
echo "$(date -Is) trainer start $*"
n=$(cat {attempts} 2>/dev/null || echo 0)
n=$((n + 1)); echo $n > {attempts}
if [ "$n" -eq 1 ]; then
  sleep 600 &            # wedged: log silent while the process tree lives
  echo $! > {sleep_pid}
  wait
else
  mkdir -p {save_dir}/model_3
fi
""",
    )

    env = dict(os.environ)
    env["PATH"] = f"{shim}:{env['PATH']}"
    env["KGTPU_WATCH_STALL_S"] = "4"
    env["KGTPU_WATCH_TICK_S"] = "2"
    env["KGTPU_WATCH_GRACE_S"] = "1"

    proc = subprocess.Popen(
        ["bash", str(WATCHER), str(save_dir), "3", str(log), "--",
         "bash", str(trainer)],
        env=env,
        cwd=tmp_path,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        rc = proc.wait(timeout=120)
        assert rc == 0, f"watcher exited rc={rc}; log:\n{log.read_text()}"
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)
            time.sleep(1)
            proc.kill()

    text = log.read_text()
    assert (save_dir / "model_3").is_dir()
    assert attempts.read_text().strip() == "2", text
    # the stall path (not a clean exit) triggered the relaunch
    assert "killing wedged trainer" in text, text
    assert "launch attempt 1" in text, text
    assert "present — done" in text, text
    assert "trainer exited" in text, text
    # the group kill must have reaped the wedge's CHILD too — a PID-only
    # kill would leave `sleep 600` running for 10 minutes after the test
    spid = sleep_pid.read_text().strip()
    deadline = time.time() + 10
    while Path(f"/proc/{spid}").exists() and time.time() < deadline:
        time.sleep(0.5)
    assert not Path(f"/proc/{spid}").exists(), (
        f"wedged trainer's child (sleep, pid {spid}) survived the kill")


def test_bad_knob_fails_fast(tmp_path):
    """A malformed stall knob must abort at startup, not silently disable
    stall detection for a days-long run."""
    env = dict(os.environ)
    env["KGTPU_WATCH_STALL_MIN"] = "15m"
    r = subprocess.run(
        ["bash", str(WATCHER), str(tmp_path), "3", str(tmp_path / "l"),
         "--", "true"],
        env=env, capture_output=True, text=True, timeout=30)
    assert r.returncode == 2, (r.returncode, r.stderr)
    assert "KGTPU_WATCH_STALL_MIN" in r.stderr
