"""Tree verification: vectorized stochastic rejection sampling.

Re-derivation of the reference's sequential per-node walk
(`longspec/test/llama_glide.py:1177-1245`) as a level-by-level
`lax.scan`-free masked walk: at each accepted node, its children are
examined in a fixed order with standard speculative rejection sampling;
each rejection updates the residual distribution
p <- normalize(max(p - q, 0)) before the next child is considered, and if
no child is accepted the next token is sampled from the final residual.

Exactness: examining children in a fixed order with residual updates
preserves the target distribution when each node's children are i.i.d.
samples from that node's draft distribution q (multi-draft SpecInfer-style
recursive rejection sampling). The engine's T>0 tree expansion
(`engine.py` _tree_round) samples children exactly that way — i.i.d. from
q_T, with per-node child counts allocated from path weights only — so the
end-to-end emitted law equals the target's (engine-level distribution test:
tests/test_stochastic.py). The reference instead proposes top-k children
and walks them in random order (`llama_glide.py:1177-1245`), which only
approximates the target law.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def verify_stochastic(tree_tokens, tmask, father, depth, tgt_logits, spec_logp,
                      temperature, rng, ecfg):
    """Walk the tree accepting children by rejection sampling.

    tree_tokens: [B, N] proposed tokens (root = already-emitted bonus).
    tmask: [B, N, N] ancestor masks (incl. self, col 0 = root).
    father: [B, N] father flat index (root -> 0).
    depth: [B, N] node depth (root = 0).
    tgt_logits: [B, N, V] fp32 target logits at each node.
    spec_logp: [B, N, V] fp32 draft log-softmax at each node (the proposal
        distribution for that node's children).
    temperature: python float (compiled in) OR a traced [B] f32 vector for
        per-row temperature serving (engine per_row_temperature mode; rows
        at temp<=0 run on a safe epsilon and the caller discards them).
    Returns (emit [B, A], acc_num [B], path_idx [B, A]) where A = depth+1 max:
    emit[i] is the token emitted at step i (accepted child tokens then the
    final residual/target sample), acc_num the number of valid entries,
    path_idx the tree indices whose KV rows must be committed.
    """
    b, n, v = tgt_logits.shape
    shape = ecfg.tree_shape
    offs = ecfg.level_offsets
    gamma = ecfg.tree_depth
    A = gamma + 1

    t = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    t = t.reshape(-1, 1, 1) if t.ndim else t   # [B,1,1] when per-row
    p_all = jax.nn.softmax(tgt_logits / t, axis=-1)
    # q must be the distribution proposals were actually drawn from: the
    # engine samples children from softmax(logp / (T * proposal_sharpness))
    # (exact for any sharpness — rejection sampling only needs matching q).
    q_all = jax.nn.softmax(spec_logp / (t * ecfg.proposal_sharpness), axis=-1)

    cur = jnp.zeros((b,), jnp.int32)           # current accepted node (root)
    alive = jnp.ones((b,), bool)               # still walking
    acc_num = jnp.ones((b,), jnp.int32)
    emit = jnp.zeros((b, A), jnp.int32)
    path_idx = jnp.zeros((b, A), jnp.int32)    # committed rows; [0]=root
    # residual target distribution at the node where the walk stopped
    final_p = p_all[:, 0, :]

    for lvl in range(gamma):
        lo, hi = offs[lvl + 1], offs[lvl + 2]
        c = hi - lo
        rng, k_u = jax.random.split(rng)
        u = jax.random.uniform(k_u, (b, c))
        # children of `cur` within this level (fixed index order)
        is_child = (father[:, lo:hi] == cur[:, None]) & alive[:, None]
        child_tok = tree_tokens[:, lo:hi]

        p_cur = jnp.take_along_axis(p_all, cur[:, None, None], axis=1)[:, 0]  # [B, V]
        q_cur = jnp.take_along_axis(q_all, cur[:, None, None], axis=1)[:, 0]

        # sequential accept/reject over this node's children with residuals.
        def child_step(j, state):
            p_res, accepted, acc_node, acc_tok = state
            tok = child_tok[:, j]
            is_c = is_child[:, j] & (~accepted)
            p_t = jnp.take_along_axis(p_res, tok[:, None], 1)[:, 0]
            q_t = jnp.take_along_axis(q_cur, tok[:, None], 1)[:, 0]
            ratio = (p_t + 1e-9) / (q_t + 1e-9)
            acc_now = is_c & (u[:, j] <= jnp.clip(ratio, 0.0, 1.0))
            rej_now = is_c & (~acc_now)
            # residual update on rejection: p <- norm(max(p - q, 0))
            p_new = jnp.maximum(p_res - q_cur, 0.0)
            denom = jnp.sum(p_new, axis=-1, keepdims=True)
            p_new = jnp.where(denom > 0, p_new / jnp.maximum(denom, 1e-30), p_res)
            p_res = jnp.where(rej_now[:, None], p_new, p_res)
            acc_node = jnp.where(acc_now, lo + j, acc_node)
            acc_tok = jnp.where(acc_now, tok, acc_tok)
            return (p_res, accepted | acc_now, acc_node, acc_tok)

        state = (p_cur, jnp.zeros((b,), bool), cur, jnp.zeros((b,), jnp.int32))
        for j in range(c):
            state = child_step(j, state)
        p_res, accepted, acc_node, acc_tok = state

        stop_here = alive & (~accepted)
        final_p = jnp.where(stop_here[:, None], p_res, final_p)
        step = lvl + 1
        emit = emit.at[:, lvl].set(jnp.where(accepted, acc_tok, emit[:, lvl]))
        path_idx = path_idx.at[:, step].set(jnp.where(accepted, acc_node,
                                                      path_idx[:, step]))
        acc_num = jnp.where(accepted, acc_num + 1, acc_num)
        cur = jnp.where(accepted, acc_node, cur)
        alive = alive & accepted

    # walk ended (rejection or leaf): sample the bonus from the residual /
    # target distribution at the stop node.
    leaf_stop = alive  # accepted a full path down to the last level
    p_final = jnp.where(leaf_stop[:, None],
                        jnp.take_along_axis(p_all, cur[:, None, None], axis=1)[:, 0],
                        final_p)
    rng, k_f = jax.random.split(rng)
    bonus = jax.random.categorical(
        k_f, jnp.log(jnp.maximum(p_final, 1e-30)), axis=-1).astype(jnp.int32)
    # place bonus at position acc_num-1 in emit
    emit = jax.vmap(lambda e, i, t: e.at[i].set(t))(emit, acc_num - 1, bonus)
    return emit, acc_num, path_idx
