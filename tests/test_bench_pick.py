"""bench.py headline selection: the bounded candidate pick must be
anchored on a same-process control and ignore failed combos.

The sweep records are the JSON lines scripts/probe_serving.py --json
flushes (one per combo, partial on timeout) — see bench._candidate_sweep.
"""

import importlib.util
import sys
from pathlib import Path


def _load_bench():
    path = Path(__file__).resolve().parents[1] / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()

# The round-4 settled control: fractional w128 legacy taps (the measured
# sweep winner — 3,971.3 vs 3,489.9 faces/s over the round-3 w160 block).
CTRL = {"label": "w128frac-legacy", "faces_per_sec": 3971.3, "ms": 64.46}


def test_control_only_keeps_control():
    fps, cfg = bench._pick_headline([CTRL])
    assert fps == 3971.3
    assert "settled" in cfg


def test_candidate_win_flips():
    cand = {"label": "w128frac-uw16", "faces_per_sec": 4400.0, "ms": 58.2}
    fps, cfg = bench._pick_headline([CTRL, cand])
    assert fps == 4400.0
    assert "w128frac-uw16" in cfg and "candidate pick" in cfg


def test_within_margin_keeps_control():
    # A 1% "win" is inside same-process noise — the control stays.
    cand = {"label": "w128frac-uw16", "faces_per_sec": 4000.0}
    fps, _ = bench._pick_headline([CTRL, cand])
    assert fps == 3971.3


def test_failed_and_slower_candidates_never_win():
    records = [
        CTRL,
        {"label": "w128frac-int8+int8det", "error": "MosaicError: s8 dot"},
        {"label": "w160block-legacy", "faces_per_sec": 3489.9},
    ]
    fps, _ = bench._pick_headline(records)
    assert fps == 3971.3


def test_no_control_yields_none():
    # Without the in-process anchor there is no trustworthy comparison
    # (tunnel run-to-run variance is ±20%) — bench falls back to its own
    # in-process control measurement.
    cand = {"label": "w128frac-uw16", "faces_per_sec": 9999.0}
    fps, cfg = bench._pick_headline([cand])
    assert fps is None and cfg is None


def test_best_of_multiple_candidates():
    records = [
        CTRL,
        {"label": "w128frac-uw16", "faces_per_sec": 4200.0},
        {"label": "w128frac-int8+int8det", "faces_per_sec": 4600.0},
        {"label": "w160block-uw16", "faces_per_sec": 3700.0},
    ]
    fps, cfg = bench._pick_headline(records)
    assert fps == 4600.0 and "w128frac-int8+int8det" in cfg


def _load_probe_serving():
    path = Path(__file__).resolve().parents[1] / "scripts" / "probe_serving.py"
    spec = importlib.util.spec_from_file_location("probe_serving_module", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["probe_serving_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_sweep_token_grammar():
    ps = _load_probe_serving()
    combos = ps.parse_sweep_tokens(
        "160b,128f-uw16,128f-int8+d,160b+L, 128f+L,128f@512,128f+d@384,"
        "128f/o192,96f+d/o192@384"
    )
    assert combos == [
        (160, False, "legacy", False, False, None, None),
        (128, True, "uw16", False, False, None, None),
        (128, True, "int8", True, False, None, None),
        (160, False, "legacy", False, True, None, None),
        (128, True, "legacy", False, True, None, None),
        (128, True, "legacy", False, False, 512, None),
        (128, True, "legacy", True, False, 384, None),
        (128, True, "legacy", False, False, None, 192),
        (96, True, "legacy", True, False, 384, 192),
    ]


def test_sweep_token_grammar_rejects_garbage():
    import pytest

    ps = _load_probe_serving()
    for bad in ("160", "x128f", "128f+z", "+L", "128f@", "128f@big",
                "128f/o", "128f/obig"):
        with pytest.raises(SystemExit):
            ps.parse_sweep_tokens(bad)


def test_tunnel_preflight_succeeds_on_cpu(monkeypatch):
    """The bounded preflight answers True on any live backend. CPU here;
    PALLAS_AXON_POOL_IPS is dropped so the child interpreter can't block
    on sitecustomize axon registration when the tunnel is wedged."""
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("JAX_PLATFORM_NAME", "cpu")
    assert bench._tunnel_preflight(retries=1, probe_timeout=120)


def test_tunnel_preflight_bounded_on_dead_backend(monkeypatch):
    """A backend that cannot initialize must yield False within the bound,
    never hang — this is the rc=1-with-diagnosis path of VERDICT r3 #2."""
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "nonexistent_backend")
    assert not bench._tunnel_preflight(retries=1, probe_timeout=120, backoff=0)


def test_default_tokens_gate_on_lite_weights(monkeypatch):
    """The S2D-Lite combos join the bench sweep ONLY when its trained
    weights are present (presence == the acceptance bars held — weights
    are never committed otherwise)."""
    import deepfake_vit_tpu.preprocessing.detector as det

    monkeypatch.setattr(det, "default_weights_path", lambda m="scrfd": None)
    toks = bench._default_tokens().split(",")
    assert toks[0] == "128f" and not any(t.endswith("+L") for t in toks)

    monkeypatch.setattr(
        det, "default_weights_path",
        lambda m="scrfd": "/w/lite.msgpack" if m == "lite" else None,
    )
    toks = bench._default_tokens().split(",")
    # Control stays first (it anchors the A/B); the lite combo is present.
    assert toks[0] == "128f"
    assert "128f+L" in toks
