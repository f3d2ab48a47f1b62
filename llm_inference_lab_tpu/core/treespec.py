"""Tree speculation: verify a TREE of draft candidates in one forward.

The reference lists tree speculation as Phase 4D "Planned" (README.md:85);
this is the TPU-native implementation. Instead of a single K-token chain,
the draft proposes a static tree (branching factors per depth, e.g. [3, 2]:
3 children of the current token, 2 grandchildren each => 9 nodes). The
target verifies ALL root-to-leaf paths in ONE forward pass using a tree
attention mask; acceptance walks the deepest matching path. Expected
accepted length beats a chain at equal verified-token budget because the
tree hedges the first positions.

Design (everything shape-static, jit-friendly):
- Drafting uses Medusa-style heads over the target's hidden-state carry
  (DecodeState.last_hidden): the node at depth d with branch rank c takes
  head_d's c-th most likely token — no draft model, no draft KV cache, no
  per-branch cache forking (which is what makes tree drafting hard for
  autoregressive draft models).
- Verify input: [last_committed, node_1..node_N]; node i sits at cache slot
  base+i but logical position base+depth(i). Attention inside the chunk is
  masked by ANCESTRY (precomputed [N+1, N+1] boolean), not slot order —
  see ops/attention.py tree_mask support.
- Acceptance: walk depths greedily — at each depth take the child whose
  token equals the target argmax at its parent; stop at the first depth with
  no match. Bonus token sampled from the last accepted node's logits row
  (or the root row if nothing matched) — same free-bonus property as the
  chain step.
- Commit: accepted path nodes' KV rows are compacted (gather) from their
  tree slots to the contiguous slots the cache invariant expects.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.core.state import DecodeState
from llm_inference_lab_tpu.models.base import KVCache
from llm_inference_lab_tpu.ops.sampling import sample_tokens


@dataclass(frozen=True)
class TreeConfig:
    """Static tree topology from per-depth branching factors.

    Node numbering: 0 is the root (the last committed token, depth 0);
    proposal nodes are 1..N in breadth-first order.
    """

    branching: Tuple[int, ...] = (3, 2)

    @property
    def depth(self) -> int:
        return len(self.branching)

    @property
    def num_nodes(self) -> int:  # proposal nodes (excluding root)
        n, level = 0, 1
        for b in self.branching:
            level *= b
            n += level
        return n

    def build(self):
        """Returns (parent [N+1], depth [N+1], branch_rank [N+1],
        ancestor_mask [N+1, N+1]) as numpy arrays. ancestor_mask[i, j] is
        True iff j is i or an ancestor of i (what node i may attend to
        within the chunk)."""
        parents = [-1]  # root
        depths = [0]
        ranks = [0]
        prev_level = [0]
        for d, b in enumerate(self.branching, start=1):
            level = []
            for p in prev_level:
                for c in range(b):
                    parents.append(p)
                    depths.append(d)
                    ranks.append(c)
                    level.append(len(parents) - 1)
            prev_level = level
        n = len(parents)
        anc = np.zeros((n, n), bool)
        for i in range(n):
            j = i
            while j != -1:
                anc[i, j] = True
                j = parents[j]
        return (
            np.array(parents, np.int32),
            np.array(depths, np.int32),
            np.array(ranks, np.int32),
            anc,
        )


def make_tree_spec_step(
    target_model,
    tree: TreeConfig,
    *,
    greedy: bool = True,
    temperature: float = 1.0,
    min_p: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    eos_token_id: Optional[int] = None,
    per_request_sampling: bool = False,
    logprobs_topk: int = 0,
    donate: bool = True,
    jit: bool = True,
):
    """Build the jitted tree-speculation step:
    (target_params, medusa_params, state) -> state.

    medusa_params: {"medusa_proj": [depth, D, D]} (same head params as
    draft_mode="medusa"; head d drafts depth d+1 candidates).

    Production surface (round-3 VERDICT item 7): token/top-N logprobs are
    captured at commit exactly like the chain step (the verify pass already
    holds every predicting row), and per_request_sampling reads per-slot
    temperature/top_k/top_p/min_p/seed/logit_bias from DecodeState for the
    bonus draw — which is the only sampling site (drafting is deterministic
    head top-k; acceptance is the greedy argmax walk). Together with the
    ContinuousBatcher's mode-agnostic step dispatch this puts tree
    speculation behind `specdx serve`. Round-4: paged KV is supported —
    verify rows scatter through the page table like the chain step, the
    ancestry mask transfers unchanged (slot == page ordinal * P + offset),
    and path compaction is a page-indexed gather/scatter (compact_paged).
    Still excluded: LoRA, penalties, constrained decoding, pipeline
    parallelism, kv_ring.
    """
    target_apply = target_model.apply_fn
    head_fn = target_model.head_fn
    compute_dtype = target_model.config.dtype
    D_tree = tree.depth
    parents_np, depths_np, ranks_np, anc_np = tree.build()
    N = tree.num_nodes  # proposal nodes; chunk length S = N + 1
    S = N + 1
    max_branch = max(tree.branching)

    parents = jnp.asarray(parents_np)
    depths = jnp.asarray(depths_np)
    ranks = jnp.asarray(ranks_np)
    anc_mask = jnp.asarray(anc_np)

    # children[d] = node ids at depth d+1 grouped by parent, for the
    # acceptance walk: at each depth we need each candidate child of the
    # currently accepted node.
    children_by_depth = []
    for d in range(1, D_tree + 1):
        ids = np.nonzero(depths_np == d)[0]
        children_by_depth.append(jnp.asarray(ids, jnp.int32))

    def step(target_params, medusa_params, state: DecodeState) -> DecodeState:
        B = state.tokens.shape[0]
        max_len = state.tokens.shape[1]
        rng, rng_bonus = jax.random.split(state.rng)
        idx_last = jnp.maximum(state.lengths - 1, 0)
        last = jnp.take_along_axis(state.tokens, idx_last[:, None], axis=1)[:, 0]
        base = state.lengths - 1

        # ---- 1. Draft the tree from the Medusa heads ----
        proj = medusa_params["medusa_proj"]  # [D_tree, D, D]
        h = state.last_hidden.astype(compute_dtype)  # [B, D]
        # head d: top-(branching[d]) candidate tokens per sequence
        cand_by_depth = []
        for d in range(D_tree):
            logits_d = head_fn(target_params, jnp.dot(h, proj[d].astype(h.dtype)))
            _, top_ids = jax.lax.top_k(logits_d, max_branch)  # [B, max_branch]
            cand_by_depth.append(top_ids.astype(jnp.int32))
        cand = jnp.stack(cand_by_depth, axis=1)  # [B, D_tree, max_branch]

        # Node i's token = head_{depth(i)-1}'s rank(i)-th candidate.
        node_depth = depths[1:]  # [N]
        node_rank = ranks[1:]
        node_tokens = cand[:, node_depth - 1, node_rank]  # [B, N]

        # ---- 2. Verify: ONE forward over the whole tree ----
        verify_in = jnp.concatenate([last[:, None], node_tokens], axis=1)  # [B, S]
        positions = base[:, None] + depths[None, :]  # [B, S] (logical: by depth)
        target_logits, target_cache, hidden = target_apply(
            target_params, verify_in, positions, state.target_cache, base,
            tree_mask=anc_mask, return_hidden=True,
        )  # [B, S, V], cache, [B, S, D]
        if per_request_sampling:
            from llm_inference_lab_tpu.ops.sampling import logit_bias_row

            # OpenAI logit_bias: applied to every verify row BEFORE the
            # acceptance walk and the bonus draw (chain-step parity);
            # runtime-skipped when no slot carries bias.
            target_logits = jax.lax.cond(
                jnp.any(state.bias_ids >= 0),
                lambda t: t + logit_bias_row(
                    state.bias_ids, state.bias_vals, t.shape[-1]
                )[:, None, :],
                lambda t: t,
                target_logits.astype(jnp.float32),
            )

        # ---- 3. Acceptance: walk the deepest matching path ----
        tgt_ids = jnp.argmax(target_logits, axis=-1).astype(jnp.int32)  # [B, S]
        cur = jnp.zeros((B,), jnp.int32)  # current accepted node (root=0)
        alive = jnp.ones((B,), jnp.bool_)
        a = jnp.zeros((B,), jnp.int32)
        path_nodes = []
        for d in range(D_tree):
            ids = children_by_depth[d]  # [n_d] candidate nodes at this depth
            # children of `cur`: those whose parent == cur
            is_child = parents[ids][None, :] == cur[:, None]  # [B, n_d]
            tok = verify_in[:, ids]  # [B, n_d] node tokens
            want = jnp.take_along_axis(tgt_ids, cur[:, None], axis=1)  # [B,1]
            match = is_child & (tok == want)
            any_match = jnp.any(match, axis=1)
            pick = jnp.argmax(match, axis=1).astype(jnp.int32)  # first match
            nxt = ids[pick]
            alive = alive & any_match
            cur = jnp.where(alive, nxt, cur)
            a = a + alive.astype(jnp.int32)
            path_nodes.append(cur)
        path = jnp.stack(path_nodes, axis=1) if D_tree else jnp.zeros((B, 0), jnp.int32)
        # path[:, j] = accepted node at depth j+1 (or stale value if j >= a)

        # ---- 4. Bonus from the deepest accepted node's logits row ----
        bonus_logits = jnp.take_along_axis(
            target_logits, cur[:, None, None], axis=1
        )[:, 0].astype(jnp.float32)
        if per_request_sampling:
            from llm_inference_lab_tpu.ops.sampling import fold_rows

            # Per-slot seed stream: same derivation as the chain step
            # (slot key folded with committed length, then the site id).
            row_keys = fold_rows(
                jax.vmap(jax.random.fold_in)(state.slot_rng, state.lengths),
                N,
            )
            bonus = sample_tokens(
                rng_bonus, bonus_logits, temperature=state.temperature,
                top_k=state.top_k, top_p=state.top_p, min_p=state.min_p,
                greedy=False, row_keys=row_keys,
            )
        else:
            bonus = sample_tokens(
                rng_bonus, bonus_logits, temperature=temperature, top_k=top_k,
                top_p=top_p, min_p=min_p, greedy=greedy,
            )

        # ---- 5. Commit: tokens + KV compaction ----
        jdx = jnp.arange(D_tree + 1, dtype=jnp.int32)[None, :]  # [1, D+1]
        path_tokens = jnp.take_along_axis(verify_in, path, axis=1) if D_tree else path
        write_vals = jnp.where(
            jdx < a[:, None],
            jnp.concatenate([path_tokens, path_tokens[:, -1:]], axis=1)
            if D_tree else jnp.broadcast_to(bonus[:, None], (B, 1)),
            bonus[:, None],
        )  # [B, D+1]

        commit = a + 1
        if eos_token_id is not None:
            is_eos = (write_vals == eos_token_id) & (jdx < commit[:, None])
            any_eos = jnp.any(is_eos, axis=1)
            first_eos = jnp.argmax(is_eos, axis=1).astype(jnp.int32)
            commit = jnp.where(any_eos, first_eos + 1, commit)
        remaining = state.prompt_lens + state.max_new - state.lengths
        commit = jnp.minimum(commit, jnp.maximum(remaining, 0))
        commit = jnp.minimum(commit, max_len - state.lengths - 1)
        commit = jnp.where(state.active, commit, 0)

        new_tokens = jax.vmap(
            lambda t, v, s: jax.lax.dynamic_update_slice(t, v, (s,))
        )(state.tokens, write_vals, state.lengths)
        new_tokens = jnp.where(state.active[:, None], new_tokens, state.tokens)

        # Target log-prob of every committed token (chain-step parity —
        # powers the OpenAI logprobs field): write slot j's token was
        # predicted by the row of its parent on the accepted path — node
        # path[:, j-1] for j >= 1, the root row for j = 0. For the bonus at
        # slot a that row is `cur` == pred_rows[:, a] (path freezes at cur
        # once the walk dies). Slots beyond `commit` never matter.
        pred_rows = (
            jnp.concatenate([jnp.zeros((B, 1), jnp.int32), path], axis=1)
            if D_tree else jnp.zeros((B, 1), jnp.int32)
        )  # [B, D_tree+1]
        rows_lp = jnp.take_along_axis(
            target_logits, pred_rows[..., None], axis=1
        )  # [B, D+1, V]
        logz = jax.scipy.special.logsumexp(rows_lp, axis=-1)
        tok_logit = jnp.take_along_axis(
            rows_lp, write_vals[..., None], axis=-1
        )[..., 0]
        new_lp = jax.vmap(
            lambda t, v, s: jax.lax.dynamic_update_slice(t, v, (s,))
        )(state.token_logprobs, tok_logit - logz, state.lengths)
        new_lp = jnp.where(
            state.active[:, None], new_lp, state.token_logprobs
        )
        if logprobs_topk:
            tvals, tids = jax.lax.top_k(rows_lp, logprobs_topk)
            tlps = tvals - logz[..., None]  # [B, D+1, N]
            w2 = jax.vmap(
                lambda t, v, s: jax.lax.dynamic_update_slice(t, v, (s, 0))
            )
            new_tids = w2(state.top_ids, tids, state.lengths)
            new_tlps = w2(state.top_lps, tlps, state.lengths)
            act2 = state.active[:, None, None]
            new_tids = jnp.where(act2, new_tids, state.top_ids)
            new_tlps = jnp.where(act2, new_tlps, state.top_lps)
        else:
            new_tids, new_tlps = state.top_ids, state.top_lps

        # KV compaction: accepted path node j (tree slot base+path[:, j])
        # must live at slot base+1+j. Gather rows; mask j >= a with the row
        # already at the destination (no-op).
        dst = base[:, None] + 1 + jnp.arange(D_tree, dtype=jnp.int32)[None, :]
        use = jdx[:, 1:] <= a[:, None] if D_tree else jnp.zeros((B, 0), bool)
        src = base[:, None] + path if D_tree else dst
        take_from = jnp.where(use, src, dst)  # no-op where not accepted

        def compact(cache: KVCache) -> KVCache:
            # [L, B, H, T, Dh]; gather along T per batch lane.
            def per_lane(k_b, v_b, ks_b, vs_b, idx_b, dst_b):
                # k_b: [L, H, T, Dh]
                rows_k = k_b[:, :, idx_b, :]  # [L, H, D_tree, Dh]
                rows_v = v_b[:, :, idx_b, :]
                k_b = k_b.at[:, :, dst_b, :].set(rows_k)
                v_b = v_b.at[:, :, dst_b, :].set(rows_v)
                ks_b = ks_b.at[:, :, dst_b].set(ks_b[:, :, idx_b])
                vs_b = vs_b.at[:, :, dst_b].set(vs_b[:, :, idx_b])
                return k_b, v_b, ks_b, vs_b

            k, v, ks, vs = jax.vmap(per_lane, in_axes=(1, 1, 1, 1, 0, 0),
                                    out_axes=(1, 1, 1, 1))(
                cache.k, cache.v, cache.k_scale, cache.v_scale, take_from, dst
            )
            return KVCache(k, v, ks, vs)

        def compact_paged(cache):
            # Paged pool: slot t of lane b lives at pool page
            # table[b, t // P], row t % P — compaction is a page-indexed
            # gather + scatter over the whole batch at once (pages are
            # shared pool rows, so no per-lane vmap). Ordinals clip to the
            # table width like the write path (scatter_paged_stack); lanes
            # near the end of their allocation land in their own last page,
            # which the no_room deactivation makes unreachable.
            from llm_inference_lab_tpu.models.paged import PagedKVCache

            P = cache.page_size
            M = cache.table.shape[1]

            def rowcol(slots):
                ordinal = jnp.clip(slots // P, 0, M - 1)
                pages = jnp.take_along_axis(cache.table, ordinal, axis=1)
                return pages, slots % P

            sp, so = rowcol(take_from)  # [B, D_tree] x2
            dp, do = rowcol(dst)
            # Advanced-index dims (B, D_tree) lead in both gather and
            # scatter, so the row block round-trips shape-identically:
            # [B, D_tree, L, KVH, Dh].
            rows_k = cache.k[:, sp, :, so, :]
            rows_v = cache.v[:, sp, :, so, :]
            rows_ks = cache.k_scale[:, sp, :, so]
            rows_vs = cache.v_scale[:, sp, :, so]
            return PagedKVCache(
                cache.k.at[:, dp, :, do, :].set(rows_k),
                cache.v.at[:, dp, :, do, :].set(rows_v),
                cache.k_scale.at[:, dp, :, do].set(rows_ks),
                cache.v_scale.at[:, dp, :, do].set(rows_vs),
                cache.table,
            )

        if D_tree:
            is_paged = not isinstance(target_cache, KVCache)
            target_cache = (
                compact_paged(target_cache) if is_paged
                else compact(target_cache)
            )

        new_lengths = state.lengths + commit
        hit_eos = (
            jnp.any((write_vals == eos_token_id) & (jdx < commit[:, None]), axis=1)
            if eos_token_id is not None
            else jnp.zeros((B,), jnp.bool_)
        )
        exhausted = (new_lengths - state.prompt_lens) >= state.max_new
        no_room = new_lengths + S + 1 > max_len
        new_active = state.active & ~hit_eos & ~exhausted & ~no_room

        # Hidden carry: the row of the deepest accepted node (which predicted
        # the bonus) feeds the next step's heads.
        h_row = jnp.take_along_axis(hidden, cur[:, None, None], axis=1)[:, 0].astype(
            jnp.float32
        )
        new_last_hidden = jnp.where(state.active[:, None], h_row, state.last_hidden)
        new_prev_hidden = jnp.where(
            state.active[:, None], state.last_hidden, state.prev_hidden
        )

        act = state.active.astype(jnp.int32)
        return state.replace(
            tokens=new_tokens,
            lengths=new_lengths,
            active=new_active,
            target_cache=target_cache,
            rng=rng,
            proposed=state.proposed + N * act,
            accepted=state.accepted + a * act,
            bonus=state.bonus + act,
            steps=state.steps + 1,
            last_hidden=new_last_hidden,
            prev_hidden=new_prev_hidden,
            token_logprobs=new_lp,
            top_ids=new_tids,
            top_lps=new_tlps,
        )

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(2,))
