"""Multi-chip scaling bench harness smoke (benchmarks/multichip_bench.py).

The harness must RUN end to end on the virtual 8-device CPU mesh the
test suite provides, so that on day one with a real slice the only
change is the flags.  Numbers on CPU are meaningless; the test asserts
structure, not speed.
"""
import json

import pytest


@pytest.mark.slow
def test_multichip_bench_runs_on_virtual_mesh(tmp_path, capsys):
    from benchmarks import multichip_bench

    out = tmp_path / "mc.json"
    multichip_bench.run(["--dp_sizes", "1,2", "--tp_size", "2",
                         "--pp_size", "2", "--sp_sizes", "2",
                         "--ep_size", "2", "--scale", "0.05",
                         "--seq_len", "64", "--reps", "1",
                         "--out_json", str(out)])
    report = json.loads(out.read_text())
    whats = [r["what"] for r in report["rows"]]
    assert whats.count("decoder_train_step") == 2
    assert whats.count("sharded_serve_block") == 2
    assert whats.count("whisper_asr_dp_batch") == 2
    assert "llama_tp_decode_block" in whats
    assert "llama_pp_pooled_decode_block" in whats
    assert "llama_moe_ep_pooled_decode_block" in whats
    assert "decoder_train_step_sp" in whats
    for r in report["rows"]:
        assert r.get("tokens_per_s", r.get("utterances_per_s", 0)) > 0
    # dp=2 rows exist with doubled global batch/streams
    train2 = [r for r in report["rows"]
              if r["what"] == "decoder_train_step" and r["dp"] == 2][0]
    assert train2["batch"] == 2
    serve2 = [r for r in report["rows"]
              if r["what"] == "sharded_serve_block" and r["dp"] == 2][0]
    assert serve2["streams"] == 4
