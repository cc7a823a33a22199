"""The BENCH_EXTRAS writer must merge, never clobber (VERDICT r4 Weak #1).

A budget-starved extras rerun used to regenerate BENCH_EXTRAS.json from
scratch, replacing every previously-measured row with a ``skipped`` entry.
``bench.merge_extras`` now carries prior measured rows forward (dated);
these tests pin that contract.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    # import bench.py without triggering jax device probing at module scope
    # (it only imports jax + stylex_tpu.utils.timing, both CPU-safe here)
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


PRIOR = {
    "dtype": "bfloat16",
    "elapsed_s": 1282.0,
    "attfind64_mfu": 0.3971,
    "train64_imgs_per_sec": 716.67,
    "train64_step_seconds": 0.0447,
    "train256_imgs_per_sec": 49.24,
    "skipped": [],
    "row_dates": {"train256_imgs_per_sec": "2026-08-18"},
    "addenda_2026-08-19": {
        "note": "measured on the slow-relay day",
        "attfind64_primary_styles_per_sec": 58226.8,
        "train64_imgs_per_sec": 600.0,
    },
}


def test_starved_rerun_loses_no_rows(bench):
    """A rerun that only re-measured one row keeps every prior row."""
    extras = {"dtype": "bfloat16", "attfind64_mfu": 0.40, "elapsed_s": 95.0,
              "skipped": [{"row": "train64", "reason": "budget"}]}
    merged = bench.merge_extras(PRIOR, extras, "2026-08-20")

    # re-measured row overwritten; prior rows carried with their dates
    assert merged["attfind64_mfu"] == 0.40
    assert merged["train64_imgs_per_sec"] == 716.67
    assert merged["train64_step_seconds"] == 0.0447
    assert merged["train256_imgs_per_sec"] == 49.24
    assert merged["carried_forward"]["train64_imgs_per_sec"] == "unknown"
    assert merged["carried_forward"]["train256_imgs_per_sec"] == "2026-08-18"
    assert "attfind64_mfu" not in merged["carried_forward"]
    assert merged["row_dates"]["attfind64_mfu"] == "2026-08-20"
    assert merged["row_dates"]["train256_imgs_per_sec"] == "2026-08-18"
    # run metadata reflects THIS run, not the prior one
    assert merged["elapsed_s"] == 95.0
    assert merged["skipped"] == extras["skipped"]


def test_addenda_supersession_by_measured_and_carried(bench):
    extras = {"dtype": "bfloat16", "attfind64_mfu": 0.40}
    merged = bench.merge_extras(PRIOR, extras, "2026-08-20")
    blk = merged["addenda_2026-08-19"]
    # train64_imgs_per_sec exists in merged (carried) -> superseded copy dropped
    assert "train64_imgs_per_sec" not in blk
    assert "train64_imgs_per_sec" in blk["superseded_by_this_run"]
    # the unique addenda measurement survives
    assert blk["attfind64_primary_styles_per_sec"] == 58226.8


def test_idempotent_reflush(bench):
    """flush() runs after every row: merging twice must equal merging once."""
    extras = {"dtype": "bfloat16", "attfind64_mfu": 0.40}
    once = bench.merge_extras(PRIOR, extras, "2026-08-20")
    twice = bench.merge_extras(PRIOR, extras, "2026-08-20")
    assert once == twice
    # and re-merging the OUTPUT as the new prior changes nothing either
    again = bench.merge_extras(json.loads(json.dumps(once)), extras, "2026-08-20")
    assert again == once


def test_empty_prior(bench):
    extras = {"dtype": "bfloat16", "attfind64_mfu": 0.40}
    merged = bench.merge_extras({}, extras, "2026-08-20")
    assert merged["attfind64_mfu"] == 0.40
    assert "carried_forward" not in merged
    assert merged["row_dates"] == {"attfind64_mfu": "2026-08-20"}


def test_dtype_mismatch_tagged(bench):
    merged = bench.merge_extras(PRIOR, {"dtype": "float32", "new_row": 1.0}, "2026-08-20")
    assert merged["carried_forward_dtype"] == "bfloat16"


@pytest.mark.slow  # subprocess jax import ~70 s on this 1-core host
def test_starved_child_end_to_end(bench, tmp_path):
    """Drive extras_main with a zero budget in a subprocess against a copy
    of a complete file: every measured row must survive untouched."""
    repo_copy = tmp_path / "benchrepo"
    repo_copy.mkdir()
    (repo_copy / "bench.py").write_text(open(os.path.join(REPO, "bench.py")).read())
    (repo_copy / "BENCH_EXTRAS.json").write_text(json.dumps(PRIOR))
    env = dict(os.environ)
    env.update({
        "STYLEX_BENCH_BUDGET_S": "0",  # starve every row immediately
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    p = subprocess.run(
        [sys.executable, str(repo_copy / "bench.py"), "--extras-only"],
        cwd=repo_copy, env=env, capture_output=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr.decode()
    out = json.loads((repo_copy / "BENCH_EXTRAS.json").read_text())
    for k in ("attfind64_mfu", "train64_imgs_per_sec", "train64_step_seconds",
              "train256_imgs_per_sec"):
        assert out[k] == PRIOR[k], k
    # every gated row skipped — count the registrations so adding a row
    # to bench.py can't silently stale this assertion (r5: 10 -> 11)
    import re

    n_gated = len(re.findall(r'^\s*gated\("', open(os.path.join(REPO, "bench.py")).read(), re.M))
    assert len(out["skipped"]) == n_gated
    assert all(s["reason"] == "budget" for s in out["skipped"])
    assert set(out["carried_forward"]) >= {"attfind64_mfu", "train64_imgs_per_sec"}
