"""runtime.tracing — stage timers, structured logging, profiler gating
(SURVEY.md section 5 "tracing/profiling": the reference has none; the
rebuild adds per-stage timing + JSON-line logging + jax.profiler hooks)."""
import json

import jax.numpy as jnp

from ternary_image_codec_tpu.runtime import tracing


class TestStageTimer:
    def test_accumulates_calls(self):
        tracing.stage_report(reset=True)
        for _ in range(3):
            with tracing.stage_timer("encode"):
                pass
        with tracing.stage_timer("decode", sync=jnp.arange(4)):
            pass
        rep = tracing.stage_report(reset=True)
        assert rep["encode"]["calls"] == 3
        assert rep["decode"]["calls"] == 1
        assert rep["decode"]["total_s"] >= 0.0
        assert tracing.stage_report() == {}

    def test_exception_still_recorded(self):
        tracing.stage_report(reset=True)
        try:
            with tracing.stage_timer("boom"):
                raise ValueError
        except ValueError:
            pass
        assert tracing.stage_report(reset=True)["boom"]["calls"] == 1


class TestLogEvent:
    def test_off_by_default(self, capsys, monkeypatch):
        monkeypatch.delenv("T3_LOG", raising=False)
        tracing.log_event("x", a=1)
        assert capsys.readouterr().err == ""

    def test_json_line_when_enabled(self, capsys, monkeypatch):
        monkeypatch.setenv("T3_LOG", "1")
        tracing.log_event("encode_done", frames=2)
        rec = json.loads(capsys.readouterr().err)
        assert rec["event"] == "encode_done" and rec["frames"] == 2
        assert "ts" in rec


class TestDeviceTrace:
    def test_noop_without_dir(self):
        with tracing.device_trace(None):
            x = jnp.sum(jnp.ones(8))
        assert float(x) == 8.0

    def test_trace_writes_or_degrades(self, tmp_path, monkeypatch):
        # on CPU the profiler works and writes a plugins dir; on exotic
        # backends it may fail -- either way the body must run exactly once
        monkeypatch.setenv("T3_LOG", "")
        ran = 0
        with tracing.device_trace(str(tmp_path / "tr")):
            ran += 1
            jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
        assert ran == 1
