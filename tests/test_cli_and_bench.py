"""CLI + bench-harness tests (reference tests cover run_specdec flag parsing
and the k-sweep dry-run mode, comprehensive_k_sweep.py:261-291)."""

import json
import os

import pytest

from llm_inference_lab_tpu.bench.k_sweep import run_k_sweep, save_results
from llm_inference_lab_tpu.bench.run_bench import BenchmarkRunner
from llm_inference_lab_tpu.cli import main as cli_main


def test_cli_run_fake(capsys):
    rc = cli_main(["run", "hello cli", "--impl", "fake", "-k", "2",
                   "--max-tokens", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generated_tokens"] > 0
    assert out["impl"] == "fake"


def test_cli_policy_params(capsys):
    rc = cli_main(["run", "p", "--impl", "fake", "--policy", "conf_threshold",
                   "--tau", "0.3", "--max-tokens", "6"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["policy"] == "conf_threshold"


def test_cli_baseline(capsys):
    rc = cli_main(["run", "p", "--impl", "fake", "--no-draft", "--max-tokens", "6"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["proposed"] == 0


def test_cli_config_file(tmp_path, capsys):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("max_draft: 3\nmax_new_tokens: 5\n")
    rc = cli_main(["run", "p", "--impl", "fake", "--config", str(cfg)])
    assert rc == 0


def test_k_sweep_dry_run(monkeypatch):
    monkeypatch.setenv("SPECDX_DRY_RUN", "1")
    out = run_k_sweep(implementation="fake", max_k=3)
    assert set(out["summary_results"]) == {"k=1", "k=2", "k=3"}
    assert out["summary_results"]["k=1"]["dry_run"]


def test_k_sweep_fake_and_save(tmp_path):
    out = run_k_sweep(
        implementation="fake", base_model="fake", draft_model="fake",
        max_k=2, max_new_tokens=6, iterations=1,
        prompts=["a", "bb"], output_dir=str(tmp_path),
    )
    for k in ("k=1", "k=2"):
        assert out["summary_results"][k]["success_rate"] == 1.0
        assert out["summary_results"][k]["tokens_per_sec"]["mean"] > 0
    files = os.listdir(tmp_path)
    assert any(f.endswith(".json") for f in files)
    assert any(f.endswith(".csv") for f in files)


def test_k_sweep_system_info_has_kernel_audit():
    from llm_inference_lab_tpu.bench.k_sweep import system_info

    info = system_info()
    assert "verify_prefix" in info["kernel_backends"]
    assert "decode_attention" in info["kernel_backends"]


def test_benchmark_runner_compare():
    runner = BenchmarkRunner(
        mode="specdec", implementation="fake", base_model="fake",
        draft_model="fake", max_draft=2, iterations=1, warmup=0,
    )
    out = runner.compare_to_baseline(["compare prompt"], max_new_tokens=6)
    assert out["specdec"]["tokens_per_sec"]["mean"] > 0
    assert out["baseline"]["tokens_per_sec"]["mean"] > 0
    assert out["speedup"] > 0


def test_readme_perf_table_current():
    """The README performance table must be regenerable as a NO-OP from the
    committed artifacts (scripts/regen_results.py --check) — the freshness
    enforcement regen_results.py's docstring promises. Scope: the
    builder-visible tree; the driver appends its own BENCH artifact after
    the snapshot, which the next regeneration picks up."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "scripts/regen_results.py", "--check"],
        capture_output=True, text=True, cwd=root, timeout=120,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_bench_real_weights_branch(tmp_path):
    """bench.py's real-checkpoint branch (round-3 VERDICT task 10): with a
    seeded HF cache, the bench must report weights=real-checkpoint, assert
    acceptance > 0, and emit the quantized-vs-fp perplexity delta — so the
    acceptance-parity claim closes itself the moment real weights exist."""
    import json
    import os
    import subprocess
    import sys

    import torch
    import transformers

    # The flake history (rounds 3-4): random-init hidden-64 weights produce
    # logits whose top-2 margin is float-noise-sized, and the draft forward
    # (K positions) and verify forward (K+1 positions) reduce in different
    # orders — on CPU the split depends on the thread count, so under a
    # loaded suite a near-tie argmax-flips differently per run (observed as
    # acceptance==0 in full-suite runs where this test passed alone).
    # Round-5 fix is STRUCTURAL, not a rescale: the tied embedding is a
    # scaled identity (vocab == hidden == 64), so the residual stream is
    # dominated by one coordinate (~5.0) against default-init (std 0.02)
    # transformer perturbations — top-2 logit margins are O(1), orders
    # above even bf16 rounding (~0.04 at these magnitudes), and the margin
    # is ASSERTED on the greedy trajectory before the checkpoint ships.
    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=1024, tie_word_embeddings=True,
    )
    m = transformers.LlamaForCausalLM(hf_cfg).eval()
    with torch.no_grad():
        m.model.embed_tokens.weight.copy_(5.0 * torch.eye(64))
    # Tie-free-ness proof: greedy-decode the torch model and require every
    # step's top-2 logit margin to dwarf cross-shape reduction noise.
    with torch.no_grad():
        ids = torch.arange(1, 17)[None]
        min_margin = float("inf")
        for _ in range(48):
            logits = m(ids).logits[0, -1]
            top2 = torch.topk(logits, 2).values
            min_margin = min(min_margin, float(top2[0] - top2[1]))
            ids = torch.cat(
                [ids, logits.argmax()[None, None]], dim=1
            )
    assert min_margin > 0.5, (
        f"synthetic checkpoint not provably tie-free: margin {min_margin}"
    )
    snap = tmp_path / "hub" / "models--llama-tiny" / "snapshots" / "s0"
    snap.mkdir(parents=True)
    m.save_pretrained(snap, safe_serialization=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Scrub session-polluted SPECDX_* vars: pytest COLLECTION imports every
    # test module, and test_kv_quant/test_pallas_kernels set
    # SPECDX_PALLAS_INTERPRET=1 at module level — inherited here, it put
    # the subprocess engine on interpret-mode kernels whose CPU numerics
    # broke draft/verify agreement (the full-suite-only acceptance=0.0
    # failures of rounds 3-5; passes in targeted runs where only this
    # file is collected).
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("SPECDX_")}
    env.update(
        HF_HOME=str(tmp_path), SPECDX_BENCH_SMALL="1",
        SPECDX_BENCH_QUANT="int8", SPECDX_BENCH_K="2",
        # Kill the load-dependence too: single-threaded XLA CPU makes the
        # draft/verify reduction order deterministic regardless of suite
        # parallelism (the subprocess doesn't need the conftest's virtual
        # device mesh).
        XLA_FLAGS="--xla_cpu_multi_thread_eigen=false",
        OMP_NUM_THREADS="1",
    )
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import runpy; runpy.run_path('bench.py', run_name='__main__')"],
        env=env, capture_output=True, text=True, cwd=root, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["weights"] == "real-checkpoint", out
    # Same checkpoint drafts for itself. The margin proof above makes
    # argmax flips structurally rare, but int8 quantization is applied to
    # draft and verify INPUTS of different shapes, so isolated per-step
    # disagreements can still occur under unusual reduction splits; the
    # claim under test is real-weight draft/target agreement, which > 0.5
    # proves (random-vocab-64 agreement would be ~0.016). bench.py's own
    # acceptance>0 assertion already ran inside the subprocess.
    assert out["acceptance_rate"] > 0.5, out
    assert "perplexity_delta" in out, out
    assert out["perplexity_quant"] > 0, out
