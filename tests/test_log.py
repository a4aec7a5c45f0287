"""Structured logger: level control, JSON event lines, warning fields."""

import json
import logging

from model_matching_tpu.utils import log as mmlog


def test_log_event_json_mode(monkeypatch, capsys):
    monkeypatch.setenv("MM_TPU_LOG_JSON", "1")
    mmlog.log_event("unit_test", a=1, b="x", f=0.5)
    out = capsys.readouterr().out.strip()
    rec = json.loads(out)
    assert rec["event"] == "unit_test"
    assert rec["a"] == 1 and rec["b"] == "x" and rec["f"] == 0.5
    assert "ts" in rec


def test_log_event_logger_mode(monkeypatch, caplog):
    monkeypatch.delenv("MM_TPU_LOG_JSON", raising=False)
    logger = mmlog.get_logger()
    with caplog.at_level(logging.INFO, logger=logger.name):
        logger.propagate = True  # let caplog capture
        try:
            mmlog.log_event("evt", n=3)
            mmlog.warn("something overflowed", cap=96)
        finally:
            logger.propagate = False
    msgs = [r.message for r in caplog.records]
    assert any('"event": "evt"' in m for m in msgs)
    warnings = [r for r in caplog.records if r.levelno == logging.WARNING]
    assert warnings and "cap" in warnings[0].message


def test_run_emits_structured_event(monkeypatch, capsys):
    """The estimator emits a stocs_run event with phase timings."""
    import jax

    from __graft_entry__ import _synthetic_setup
    from model_matching_tpu.estimator import StocsEstimator

    monkeypatch.setenv("MM_TPU_LOG_JSON", "1")
    model, scene, cfg = _synthetic_setup(
        num_model=128, num_scene=512, num_bases=4,
        max_pairs=256, max_congruent=8,
    )
    StocsEstimator(model, scene, cfg).run(verbose=False)
    lines = [
        json.loads(l) for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    runs = [r for r in lines if r.get("event") == "stocs_run"]
    assert runs, lines
    assert "timings_ms" in runs[0] and "hypotheses" in runs[0]
