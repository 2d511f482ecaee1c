"""Tests for the standalone scripts/ utilities (no jax needed)."""

import os
import subprocess
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

from rename_dataset import plan  # noqa: E402


def _touch(d, *names):
    for n in names:
        open(os.path.join(d, n), "w").close()


def test_rename_plan_strip_and_dedupe(tmp_path):
    """renamer.sh semantics (strip masked_ prefix, collapse doubled _hdN
    suffixes) as a config-driven plan."""
    d = str(tmp_path)
    _touch(d, "masked_a_hd1.jpg", "b_hd2_hd2.jpg", "keep.jpg")
    got = plan(d, "masked_", ["_hd1", "_hd2"])
    assert got == [("b_hd2_hd2.jpg", "b_hd2.jpg"),
                   ("masked_a_hd1.jpg", "a_hd1.jpg")]


def test_rename_refuses_clobber(tmp_path):
    """POSIX rename silently replaces; the plan must refuse overwriting an
    existing file or mapping two sources onto one target."""
    d = str(tmp_path)
    _touch(d, "masked_x.jpg", "x.jpg")
    with pytest.raises(SystemExit, match="overwrite"):
        plan(d, "masked_", [])
    d2 = str(tmp_path / "two")
    os.makedirs(d2)
    _touch(d2, "y_hd1_hd1.jpg", "masked_y_hd1.jpg")
    with pytest.raises(SystemExit, match="map to"):
        plan(d2, "masked_", ["_hd1"])


def test_rename_cli_dry_run_then_apply(tmp_path):
    """Dry-run by default (prints the plan, filesystem untouched);
    --apply performs the renames."""
    d = str(tmp_path)
    _touch(d, "masked_c_hd3_hd3.jpg")
    cmd = [sys.executable, os.path.join(SCRIPTS, "rename_dataset.py"), d,
           "--strip-prefix", "masked_", "--dedupe-suffix", "_hd3"]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    assert "masked_c_hd3_hd3.jpg -> c_hd3.jpg" in out.stdout
    assert os.listdir(d) == ["masked_c_hd3_hd3.jpg"]  # untouched
    subprocess.run(cmd + ["--apply"], capture_output=True, check=True)
    assert os.listdir(d) == ["c_hd3.jpg"]


def test_json_flusher_backs_up_partial_curves(tmp_path, monkeypatch):
    """A ledger retry must never lose a longer partial curve from an
    earlier attempt (advisor r4 #1): json_flusher copies any pre-existing
    results file to <path>.prevN at creation, and the path keeps the old
    rows until the retry's first flush."""
    import json

    from ledger_common import json_flusher

    monkeypatch.chdir(tmp_path)
    first = [{"ckpt": "init"}, {"ckpt": "mid"}]
    json_flusher("r.json", first)()
    # Retry that dies before its first row: path still holds the old curve.
    json_flusher("r.json", [])
    assert json.load(open("r.json")) == first
    assert json.load(open("r.json.prev1")) == first
    # Retry that flushes a shorter curve: old curve survives in .prev2.
    retry = [{"ckpt": "init"}]
    json_flusher("r.json", retry)()
    assert json.load(open("r.json")) == retry
    assert json.load(open("r.json.prev2")) == first
