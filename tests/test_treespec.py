"""Tree-speculation tests (reference Phase 4D "Planned", README.md:85 —
green-field feature: tree topology, tree attention mask, path acceptance,
KV compaction, end-to-end correctness vs baseline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.core.treespec import TreeConfig
from llm_inference_lab_tpu.models.fake import make_fake_model


def test_tree_topology():
    t = TreeConfig((3, 2))
    assert t.num_nodes == 3 + 6
    parents, depths, ranks, anc = t.build()
    assert parents.tolist()[:4] == [-1, 0, 0, 0]
    assert depths.tolist() == [0, 1, 1, 1, 2, 2, 2, 2, 2, 2]
    # node 4 is the first child of node 1: ancestors {4, 1, 0}
    assert parents[4] == 1
    assert set(np.nonzero(anc[4])[0].tolist()) == {0, 1, 4}
    # no cross-branch visibility
    assert not anc[4, 2]


def test_tree_mask_attention_isolates_branches():
    """Within the chunk, a node must only see its ancestor chain."""
    from llm_inference_lab_tpu.ops.attention import attend_xla

    B, H, D, T = 1, 1, 8, 16
    tree = TreeConfig((2,))
    _, _, _, anc = tree.build()
    S = tree.num_nodes + 1  # 3
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.zeros((B, H, T, D), jnp.float32)
    # Distinct value rows per slot so attention output reveals visibility.
    v = jnp.asarray(np.arange(T, dtype=np.float32)[None, None, :, None]
                    * np.ones((B, H, T, D), np.float32))
    base = jnp.asarray([4], jnp.int32)  # chunk slots 4, 5, 6
    # Equal scores -> output = mean of visible value rows.
    k = k.at[:, :, :7].set(0.0)
    q = jnp.zeros_like(q)
    pos = jnp.asarray([[4, 5, 5]], jnp.int32)
    out = attend_xla(q, k, v, pos, tree_mask=jnp.asarray(anc), chunk_start=base)
    # Node 1 (chunk idx 1, slot 5) sees prefix slots 0-3 + slots {4, 5}.
    expect_node1 = np.mean([0, 1, 2, 3, 4, 5])
    np.testing.assert_allclose(out[0, 1, 0, 0], expect_node1, rtol=1e-5)
    # Node 2 (chunk idx 2, slot 6) sees prefix + {4, 6} — NOT slot 5.
    expect_node2 = np.mean([0, 1, 2, 3, 4, 6])
    np.testing.assert_allclose(out[0, 2, 0, 0], expect_node2, rtol=1e-5)


def make_engine(**kw):
    defaults = dict(implementation="fake", base_model="fake", draft_model=None,
                    draft_mode="tree", max_new_tokens=16, max_seq_len=256)
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def test_tree_generates():
    eng = make_engine()
    r = eng.generate("tree speculation test")
    assert r["generated_tokens"] > 0
    assert r["draft_mode"] == "tree"


def test_tree_output_matches_baseline():
    """Tree-accepted tokens must equal the target's own greedy sequence."""
    eng = make_engine(tree={"branching": [2, 2]})
    base = Engine(
        EngineConfig(implementation="fake", draft_model=None, max_new_tokens=16),
        target_model=make_fake_model(),
    )
    for prompt in ["alpha tree", "second prompt longer text"]:
        assert (
            eng.generate(prompt)["generated_ids"]
            == base.generate(prompt)["generated_ids"]
        ), prompt


def test_tree_accepts_deep_paths():
    """Fake heads predict the target rule exactly at rank 0, so the tree
    walk should accept full depth every step (acceptance rate = depth/N)."""
    eng = make_engine(tree={"branching": [2, 2]})
    r = eng.generate("deep path check")
    # Depth-1 always matches (fake head is exact one step out), so ~2
    # tokens/step: 16 tokens in ~8-9 steps instead of 16.
    assert r["steps"] <= 9, r["steps"]
    assert r["accepted"] >= r["steps"] - 1  # >= 1 accepted node per step


@pytest.mark.parametrize("branching", [[2], [3, 2], [2, 2, 2]])
def test_tree_shapes(branching):
    eng = make_engine(tree={"branching": branching}, max_new_tokens=8)
    r = eng.generate("shapes")
    assert r["generated_tokens"] > 0


# ---- production surface (round-3 VERDICT item 7) ----

def test_tree_logprobs_match_baseline():
    """Tree-committed token logprobs must equal the baseline's own scores
    (same model, same greedy tokens -> same target distribution rows)."""
    eng = make_engine(tree={"branching": [2, 2]})
    base = Engine(
        EngineConfig(implementation="fake", draft_model=None,
                     max_new_tokens=16),
        target_model=make_fake_model(),
    )
    rt = eng.generate("tree logprob parity")
    rb = base.generate("tree logprob parity")
    assert rt["generated_ids"] == rb["generated_ids"]
    np.testing.assert_allclose(
        rt["token_logprobs"], rb["token_logprobs"], atol=1e-4
    )


def test_tree_top_logprobs():
    eng = make_engine(tree={"branching": [2]}, logprobs_topk=3,
                      max_new_tokens=8)
    r = eng.generate("tree top logprobs")
    assert r["top_logprobs"] is not None
    assert len(r["top_logprobs"]) == r["generated_tokens"]
    for alts in r["top_logprobs"]:
        assert len(alts) == 3
        # Entry 0 is the argmax the greedy walk committed -> its logprob
        # is the max.
        assert alts[0]["logprob"] >= alts[1]["logprob"]


def test_tree_per_request_sampling():
    """Tree + per_request_sampling: temperature-0 rows decode greedily and
    match the engine-greedy output; a seeded temperature row reproduces."""
    eng = make_engine(per_request_sampling=True, max_new_tokens=12)
    greedy = make_engine(max_new_tokens=12)
    p = "tree per request"
    r0 = eng.generate_batch([p], temperature=0.0)[0]
    assert r0["generated_ids"] == greedy.generate(p)["generated_ids"]
    # Seeded sampling reproduces across calls.
    a = eng.generate_batch([p], temperature=0.9, seed=7)[0]
    b = eng.generate_batch([p], temperature=0.9, seed=7)[0]
    assert a["generated_ids"] == b["generated_ids"]


def test_tree_through_batcher():
    """Tree speculation through the ContinuousBatcher (serving path) must
    equal direct engine generation."""
    from llm_inference_lab_tpu.core.batching import ContinuousBatcher

    eng = make_engine(max_new_tokens=12)
    single = [eng.generate(p)["generated_ids"]
              for p in ["tree serve a", "tree serve b sixteen"]]
    b = ContinuousBatcher(eng, n_slots=2)
    b.submit("tree serve a")
    b.submit("tree serve b sixteen")
    out = b.run()
    assert [r["generated_ids"] for r in out] == single


def _tiny_tree_engine(**kw):
    cfg = dict(
        implementation="hf", base_model="llama-tiny", draft_model=None,
        draft_mode="tree", tree={"branching": [2, 2]}, max_new_tokens=12,
        dtype="float32", max_seq_len=128,
    )
    cfg.update(kw)
    return Engine(EngineConfig(**cfg))


def test_tree_paged_matches_contiguous():
    """Round-4: tree speculation over a PAGED cache (verify rows scatter
    through the page table; path compaction is a page-indexed
    gather/scatter) must produce exactly the contiguous tree output, which
    itself equals the target's greedy sequence."""
    cont = _tiny_tree_engine()
    paged = _tiny_tree_engine(kv_layout="paged", kv_page_size=16)
    base = _tiny_tree_engine(draft_mode="vanilla", draft_model=None)
    for prompt in ["paged tree alpha", "paged tree second prompt longer"]:
        want = cont.generate(prompt)["generated_ids"]
        assert paged.generate(prompt)["generated_ids"] == want, prompt
        assert base.generate(prompt)["generated_ids"] == want, prompt


def test_tree_through_batcher_paged():
    """Tree speculation served from the ContinuousBatcher under the paged
    KV layout (the serving-scale default) — round-3 VERDICT missing #4."""
    from llm_inference_lab_tpu.core.batching import ContinuousBatcher

    eng = _tiny_tree_engine(kv_layout="paged", kv_page_size=16)
    single = [eng.generate(p)["generated_ids"]
              for p in ["tree paged serve a", "tree paged serve b two"]]
    b = ContinuousBatcher(eng, n_slots=2)
    b.submit("tree paged serve a")
    b.submit("tree paged serve b two")
    out = b.run()
    assert [r["generated_ids"] for r in out] == single
