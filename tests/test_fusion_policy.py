"""Resampler-fusion policy semantics (stylex_tpu/ops/fusion.py).

ADVICE r4: the policy must not mutate process-global os.environ, the
tri-state env override must warn once about the flipped ``=0`` meaning,
and the context default must be thread-local so concurrent tracing can't
get the wrong graph.
"""

import os
import threading
import warnings

import pytest

from stylex_tpu.ops import fusion


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("STYLEX_TPU_NO_FUSED_UPCONV", raising=False)


def test_defaults_and_context():
    assert fusion.resample_fusion_enabled()  # training default: fused
    with fusion.prefer_literal_resample():
        assert not fusion.resample_fusion_enabled()
        # no environment mutation while the context is active
        assert "STYLEX_TPU_NO_FUSED_UPCONV" not in os.environ
    assert fusion.resample_fusion_enabled()


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("STYLEX_TPU_NO_FUSED_UPCONV", "1")
    with fusion.prefer_literal_resample():
        assert not fusion.resample_fusion_enabled()
    assert not fusion.resample_fusion_enabled()
    monkeypatch.setenv("STYLEX_TPU_NO_FUSED_UPCONV", "0")  # force fused
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with fusion.prefer_literal_resample():
            assert fusion.resample_fusion_enabled()


def test_zero_value_warns_once(monkeypatch):
    monkeypatch.setenv("STYLEX_TPU_NO_FUSED_UPCONV", "0")
    monkeypatch.setattr(fusion, "_warned_zero", False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert fusion.resample_fusion_enabled()
        assert fusion.resample_fusion_enabled()
    msgs = [x for x in w if "FORCE-ENABLES" in str(x.message)]
    assert len(msgs) == 1  # once, not per call


def test_context_is_thread_local():
    """A literal-context in one thread must not leak into another."""
    seen = {}

    def other_thread():
        seen["other"] = fusion.resample_fusion_enabled()

    with fusion.prefer_literal_resample():
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        seen["inner"] = fusion.resample_fusion_enabled()
    assert seen == {"other": True, "inner": False}
