#!/usr/bin/env python
"""End-to-end LongSpec-TPU benchmark.

Measures the headline metric of the reference (BASELINE.md): wall-clock
speedup of tree speculative decoding over vanilla autoregressive decoding at
long context, lossless at temperature 0, plus mean accepted tokens per round.

Pipeline (all on-device; nothing fetched over the network — a zero-egress
box cannot download checkpoints, so each benchmark target is TRAINED here):
  1. Pretrain the target on a synthetic Markov language (sharp next-token
     margins, like a real LLM; a random-weight target has 1/V near-uniform
     logits whose argmax flips under benign fp reorderings, which would make
     any losslessness measurement meaningless). Cached to .bench_cache/.
  2. Train the GLIDE draft on the same corpus with teacher KV (the standard
     GLIDE recipe, train/trainer.py). Cached.
  3. Run vanilla decode and tree-spec decode on held-out long prompts.
  4. Verify token-exact equality (losslessness gate).
  5. Print ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Three configurations ("rows"), hardest last:
  * easy_8k  — order-1 Markov language, ctx 8192. Near-ceiling acceptance
    (~5.9 of max 6); upper-bounds the engine's mechanical overhead.
  * hard_8k  — ORDER-2 language (successor depends on the (prev, cur) pair):
    the one-layer draft must compose state pairs internally, so acceptance
    decays with speculation depth like on real text (reference real-task
    range ~3.5-4, `index.html:289-290`).
  * hard_32k — the same hard language at 32k context with a target trained
    at seq 16384: the north-star long-context configuration (BASELINE.md).

The headline metric/value/vs_baseline come from the LAST row that ran
(hard_32k by default); all rows are reported under "rows". vs_baseline
compares against the reference's published best long-context speedup on its
own hardware (2.67x, `index.html:289`).

The driver path (no flags) NEVER trains: it loads cached row results,
re-measures rows whose cached model pair is present, and always prints a
final JSON — model (re)training only runs under --train (used by
scripts/bench_supervisor.sh to build the caches in the background).

Usage: python bench.py [--smoke] [--rows hard_32k] [--gen 256] [--train]
"""
import argparse
import gc
import hashlib
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np  # noqa: E402


def log(msg):
    sys.stderr.write(msg + "\n")
    sys.stderr.flush()


class Watchdog:
    """Hard-exit if no heartbeat for `stall_s` seconds.

    The remote-TPU tunnel can wedge a device call indefinitely (observed:
    a training step that never returned, zero CPU for 30+ min). A blocked
    RPC cannot be interrupted from Python, so the only recovery is process
    exit + supervisor restart; mid-training part-checkpoints below bound
    the lost work to one checkpoint interval.

    Before exiting it prints the best result assembled so far (set via
    `set_fallback`) as the final stdout line — a wedged measurement must
    never leave the driver with nothing to parse (round-2 BENCH rc=124,
    parsed=null postmortem).
    """
    def __init__(self, stall_s=1500):
        self.t = time.time()
        self.stall_s = stall_s
        self.fallback = None
        th = threading.Thread(target=self._run, daemon=True)
        th.start()

    def beat(self):
        self.t = time.time()

    def set_fallback(self, result):
        self.fallback = result

    def _run(self):
        while True:
            time.sleep(30)
            dt = time.time() - self.t
            if dt > self.stall_s:
                log(f"[watchdog] no progress for {dt:.0f}s — exiting for "
                    "supervisor restart")
                if self.fallback is not None:
                    print(json.dumps(self.fallback), flush=True)
                os._exit(17)


WD = None


def beat():
    if WD is not None:
        WD.beat()


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def unflatten(flat):
    out = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def save_tree(path, tree):
    # atomic: a watchdog os._exit mid-save must not leave a truncated file
    # that poisons every supervisor restart (part_load reads these)
    import jax.numpy as jnp
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{k: np.asarray(v.astype(jnp.bfloat16)).view(np.uint16)
                     for k, v in flatten(tree).items()})
    os.replace(tmp, path)


def load_tree(path):
    import jax.numpy as jnp
    import ml_dtypes
    with np.load(path) as z:
        flat = {k: jnp.asarray(v.view(ml_dtypes.bfloat16))
                for k, v in z.items()}
    return unflatten(flat)


# ---------------------------------------------------------------------------
# Row definitions — shared with scripts/ (profile_tree, bench_serve,
# debug_pallas_lossless, calibrate_hard_lang) so cache tags never drift.
# ---------------------------------------------------------------------------

# largest Llama-like geometry whose FULL-PARAM training at seq 4096+ fits one
# 16GB v5e chip (params+grads bf16 ~10GB + remat activations): ~2.5B params.
# (The reference benches 7B-13B inference on one 80GB A100.)
BIG_MODEL = dict(vocab_size=32000, hidden_size=4096, intermediate_size=8192,
                 num_layers=16, num_heads=32, num_kv_heads=8, head_dim=128,
                 max_position_embeddings=65536, eos_token_id=2)

# offset_cap: anchor-offset cap — training must cover the decode context's
# rope phases (round-2 measurement: cap 30000 -> accuracy 0.25 at position
# 30k; the 32k row needs phases to ~49k).
# distill_accum: draft effective batch = accum on one chip (the 2.5B teacher
# forward caps live batch at 1 for seq >= 4k; batch-1 draft gradients were
# measurably noisy — accept 2.5 vs 3.6).
# window: decode-time sliding-window attention (target sliding_window +
# draft ca_window, each with 4 sink rows; 0 = full attention). A model
# trained at seq L has never ATTENDED over a span > L: at 2x its training
# length, full-attention teacher-forced accuracy collapses (0.85 -> 0.21 at
# band 28k, probe_position_gen round 2) because softmax dilutes over a span
# it never saw, while the SAME cached params decoded with window 12288 + 4
# sinks hold 0.85-0.86 at every band to 32k. The deployed 32k model is a
# sliding-window transformer (Mistral/StreamingLLM-style); vanilla and
# spec decode the identical model, so the speedup comparison is unchanged.
# The two hard rows (and the 128k row) share ONE model pair — the hard
# language target trained at seq 16384 with offset_cap 49152 — measured at
# different contexts. One pair instead of per-row pairs keeps the committed
# cache blobs to a single 5.4GB set (round-2 postmortem: the per-row s4096
# pair was never committed, environment resets wiped it, and the driver
# bench re-trained from scratch into a timeout). The 16k target has also
# seen ~4.5x the training tokens of the old s4096 one, which is what the
# losslessness gate needs: converged top-2 logit margins >> verify-vs-decode
# float noise.
#
# target_steps 1100: at 700 the loss was still falling steeply (0.77 ->
# 0.30 over steps 600-700) and the undertrained logit margins flipped
# under bf16 verify-vs-vanilla noise (debug_window_lossless: first
# divergence margin 4.4e-3; the language's true top-2 gaps are all
# >= 0.3, so a converged model has no near-ties).
# attn_best/tree_best: measured-best decode config per row (round-2
# sweep, row caches): at 8k the XLA chunked path wins vanilla decode
# (82 vs 71 tok/s — too few 2048-chunks to amortize the kernel's
# sequential grid) and ties tree; at 32k the pallas kernel's chunk
# skipping + VMEM streaming wins (tree 138 vs 123 tok/s) and a depth-6
# tree adds accept ~0.55 nearly free (verify is bandwidth-bound).
# ckpt_every 250: a part-save drags the full 5GB param tree through the
# device->host tunnel (~250s measured); at seq-16384 step times that is
# ~40% overhead when saving every 100 steps, ~15% at 250.
# long_128k: kv_quant int8 — a 131k-row bf16 cache (8.6GB) plus 5.1GB of
# params does not fit a 16GB chip; the int8 cache (4.4GB) does. gen 128
# bounds the two ~131k prefills' wall clock.
_HARD = dict(lang="hard", n_states=256, seq=16384, target_steps=1100,
             distill_steps=400, lr=3e-3, offset_cap=49152, distill_accum=4,
             window=12288, ckpt_every=250)
SPECS = {
    # tree_best per row = measured-best depth (r3d sweeps): acceptance
    # saturates at max depth on the easy language (accept == depth+1 at d5,
    # d6 AND d7) and rises through d7 on the hard one (5.8 -> 6.34)
    "easy_8k": dict(lang="easy", n_states=1024, seq=4096, ctx=8192,
                    target_steps=600, distill_steps=400, lr=1e-3,
                    offset_cap=30000, distill_accum=1, window=0,
                    tree_best="4,16,16,16,16,16,16"),
    "hard_8k": dict(_HARD, ctx=8192, attn_best="pallas",
                    tree_best="4,16,16,16,16,16"),
    "hard_32k": dict(_HARD, ctx=32768, attn_best="pallas",
                     tree_best="4,16,16,16,16,16,16"),
    # draft_ring: O(window) draft KV via the ring buffer (saves ~0.5GB of
    # the 131k-row budget and exercises the constant-memory draft design in
    # a headline row; 1024 >> the 512-token draft window + tree-depth slack).
    # prefill_seg: segmented prompt prefill (engine) — one-shot 131k/262k
    # prefill transients (~3.3/6.5GB) do not fit next to the cache+weights.
    # target_quant int8: the segmented-prefill graph holds every frozen
    # weight TWICE (XLA relayouts each [L,Din,Dout] stack into its matmul-
    # preferred layout — measured 19.88G requested with bf16 params at 131k:
    # 2x5.1G params + 4.4G int8 KV). int8 params (2.6G + 2.6G relayout)
    # bring the graph to ~12G. Both arms see the identical redefined target,
    # so speedup/losslessness semantics are unchanged.
    "long_128k": dict(_HARD, ctx=131072, attn_best="pallas",
                      tree_best="4,16,16,16,16,16", kv_quant="int8",
                      gen=128, draft_ring=1024, prefill_seg=8192,
                      target_quant="int8"),
    # the reference registry's maximum context (Llama-3-8B-Instruct-262k,
    # `inference_long-bench.py:58-62,95-102`), demonstrated synthetically:
    # int8 KV (8.6GB) forces int8 frozen target weights (2.6GB vs 5.1GB
    # bf16) to fit the 16GB chip. target_quant redefines the target function
    # for BOTH arms identically, so the row's speedup/losslessness semantics
    # are unchanged.
    # kv_ring: O(window) TARGET ring cache (ops/ring_cache.py) — positions
    # outside window+sinks are unreachable under the decode window, so the
    # cache holds 22528 physical rows (1.5GB bf16) instead of 262k (8.6GB
    # int8). The full-length graphs at 262k need >19G on the 15.75G chip
    # (cache + XLA relayout/remat copies); the ring fits with GBs to spare.
    # attn_best pallas: the in-kernel ring position recovery beat the XLA
    # chunked path 2.55x vs 2.33x on this row (r3e/r4 measurements — the
    # chunked path materializes the recovered-position mask chain per step)
    "long_262k": dict(_HARD, ctx=262144, attn_best="pallas",
                      tree_best="4,16,16,16,16,16", kv_ring=22528,
                      gen=64, draft_ring=1024, prefill_seg=8192,
                      target_quant="int8"),
}

DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")


def fingerprint(path, _cache={}):
    """Cheap content fingerprint of a (multi-GB) npz: sha256 over
    (size, first 1MB, last 1MB). np.savez writes array headers (names,
    shapes, dtypes) at the front and the last array's data at the back, so
    any retrain perturbs the tail bytes — unlike the old byte-size proxy,
    which is a pure function of the array NAMES/shapes for uncompressed
    savez and identical across retrains (ADVICE r2, medium)."""
    st = os.stat(path)
    key = (path, st.st_size, st.st_mtime_ns)
    if key in _cache:
        return _cache[key]
    h = hashlib.sha256()
    h.update(str(st.st_size).encode())
    with open(path, "rb") as f:
        h.update(f.read(1 << 20))
        if st.st_size > (1 << 20):
            f.seek(max(st.st_size - (1 << 20), 1 << 20))
            h.update(f.read(1 << 20))
    _cache[key] = fp = h.hexdigest()[:16]
    return fp


def row_is_fresh(rpath, tpath, dpath, row):
    """Was this cached row measured against THESE model files?

    mtime ordering proves it, but a git checkout (environment resets keep
    only committed files, so caches are restored from git) rewrites mtimes
    in arbitrary order — fall back to the model-file content fingerprints
    recorded at measurement time."""
    if os.path.getmtime(rpath) >= max(os.path.getmtime(tpath),
                                      os.path.getmtime(dpath)):
        return True
    if "_tfp" in row:
        return (row.get("_tfp") == fingerprint(tpath)
                and row.get("_dfp") == fingerprint(dpath))
    # legacy rows recorded only byte sizes (a weak proxy); require re-measure
    return False


def row_is_stale(row):
    """Does the cached row predate source changes to longspec_tpu/?

    A row measured at commit X is evidence about THAT code; if the decode
    path changed since, the row can no longer prove anything about HEAD
    (round-4 postmortem: the official artifact silently reused rows from
    five different commits, one of them red at head). Conservative: an
    unknown commit or a dirty working tree counts as stale."""
    c = row.get("_commit")
    if not c:
        return True
    root = os.path.dirname(os.path.abspath(__file__))
    try:
        same = subprocess.run(
            ["git", "diff", "--quiet", c, "HEAD", "--", "longspec_tpu/"],
            cwd=root, timeout=10).returncode == 0
        clean = subprocess.run(
            ["git", "diff", "--quiet", "HEAD", "--", "longspec_tpu/"],
            cwd=root, timeout=10).returncode == 0
        return not (same and clean)
    except Exception:
        return True


def big_model_config():
    from longspec_tpu.config import ModelConfig
    return ModelConfig(**BIG_MODEL)


def row_tag(name):
    sp = SPECS[name]
    if sp["lang"] == "easy":
        # round-1 cache tag, kept so the 5GB target is reused
        return (f"v5_tpu_{BIG_MODEL['num_layers']}x{BIG_MODEL['hidden_size']}"
                f"x{BIG_MODEL['intermediate_size']}")
    tag = f"hard{sp['n_states']}_s{sp['seq']}"
    if sp["offset_cap"] != 30000:  # cap changes the trained phase range
        tag += f"_cap{sp['offset_cap'] // 1024}k"
    # NOTE: `window` is decode-time only (the cached params are unchanged),
    # so it is deliberately NOT part of the model cache tag.
    return tag


def row_cache_paths(name, cache_dir=DEFAULT_CACHE):
    """(target_path, draft_path) for a bench row — the files get_models
    reads/writes, including the distill-accum suffix."""
    tag = row_tag(name)
    daccum = SPECS[name]["distill_accum"]
    dsuf = f"_a{daccum}" if daccum > 1 else ""
    return (os.path.join(cache_dir, f"target_{tag}.npz"),
            os.path.join(cache_dir, f"draft_{tag}{dsuf}.npz"))


def get_models(cfg, dcfg, corpus, cache_dir, tag, *, target_steps,
               distill_steps, lr, train_bsz, attn, no_cache=False,
               offset_cap=30000, distill_accum=1, ckpt_every=100):
    """Train-or-load the (target, draft) pair for one benchmark row.

    Both training phases write part-checkpoints (params + step sidecar)
    every `ckpt_every` logged steps and resume from them, so a watchdog
    restart loses at most one interval. `distill_accum > 1` runs the draft
    at effective batch = train_bsz * accum via microbatch accumulation
    (memory of train_bsz) — batch-1 distillation was measurably noisy.
    """
    import jax
    import jax.numpy as jnp
    from longspec_tpu.models import llama as M
    from longspec_tpu.train import trainer as T
    from longspec_tpu.train.distill import distill_draft

    tpath = os.path.join(cache_dir, f"target_{tag}.npz")
    dsuf = f"_a{distill_accum}" if distill_accum > 1 else ""
    dpath = os.path.join(cache_dir, f"draft_{tag}{dsuf}.npz")

    def part_load(path):
        p, s = path + ".part.npz", path + ".step.npy"
        if os.path.exists(p) and os.path.exists(s):
            try:
                return load_tree(p), int(np.load(s))
            except Exception as e:  # corrupt part (pre-atomic-save runs)
                log(f"[{tag}] discarding unreadable part file: {e}")
        return None, 0

    def part_save(path, tree, step):
        log(f"[{tag}] part-save @ step {step}...")
        t = time.time()
        save_tree(path + ".part.npz", tree)
        np.save(path + ".step.npy", np.asarray(step))
        log(f"[{tag}] part-save done ({time.time() - t:.0f}s)")
        beat()

    def part_clean(path):
        for suf in (".part.npz", ".step.npy"):
            if os.path.exists(path + suf):
                os.remove(path + suf)

    if os.path.exists(tpath) and not no_cache:
        params = load_tree(tpath)
        log(f"[{tag}] loaded cached target")
    else:
        opt = T.make_adafactor(lr=lr, warmup_steps=min(50, target_steps // 4))
        params, start = (None, 0) if no_cache else part_load(tpath)
        if params is None:
            params = jax.jit(lambda k: M.init_params(k, cfg, jnp.bfloat16))(
                jax.random.PRNGKey(0))
        else:
            log(f"[{tag}] resuming target pretraining at step {start}")
        st = T.init_train_state(params, opt)
        if start:
            st = st._replace(step=jnp.asarray(start, jnp.int32))
        # at seq >= 8k the scanned-layer backward's stacked-grad carries
        # double-buffer ~1GB blocks and fragment HBM past the chip; unroll
        step_fn = T.make_lm_train_step(cfg, opt, attn_impl=attn,
                                       unroll_layers=corpus.shape[1] >= 8192,
                                       offset_cap=offset_cap)
        rng_np = np.random.default_rng(3)
        rng_np.integers(0, corpus.shape[0], (start * train_bsz,))  # fast-fwd
        log(f"[{tag}] pretraining target ({target_steps} steps, "
            f"seq {corpus.shape[1]})...")
        tstart = time.time()
        for i in range(start, target_steps):
            idx = rng_np.integers(0, corpus.shape[0], (train_bsz,))
            st, m = step_fn(st, jnp.asarray(corpus[idx]), jax.random.PRNGKey(i))
            if (i + 1) % 10 == 0:
                float(m["loss"])  # device sync: beats must track DEVICE
                # progress, not async dispatch (watchdog forensics)
            beat()
            if (i + 1) % 100 == 0 or i + 1 == target_steps:
                log(f"  target step {i+1}: loss {float(m['loss']):.4f} "
                    f"({(time.time()-tstart)/(i+1-start):.2f}s/step)")
                beat()
            # target part-saves use a LONGER interval: the 5GB device->host
            # pull is the observed wedge trigger (attempts 1+2 both hung on
            # the device call right after a save), so fewer saves beats
            # finer resume granularity here; the 370MB draft keeps ckpt_every
            if (i + 1) % max(ckpt_every, 250) == 0 and i + 1 < target_steps:
                part_save(tpath, st.draft_params, i + 1)
        params = st.draft_params
        del st, step_fn
        save_tree(tpath, params)
        part_clean(tpath)

    if os.path.exists(dpath) and not no_cache:
        dparams = load_tree(dpath)
        log(f"[{tag}] loaded cached draft")
    else:
        dparams, start = (None, 0) if no_cache else part_load(dpath)
        if start:
            log(f"[{tag}] resuming draft distillation at step {start}")
        log(f"[{tag}] training draft ({distill_steps} steps, "
            f"batch {train_bsz}x{distill_accum})...")

        def on_step(step, dp):
            if step % ckpt_every == 0 and step < distill_steps:
                part_save(dpath, dp, step)
            beat()

        dparams, hist = distill_draft(
            params, cfg, dcfg, corpus, steps=distill_steps,
            batch=train_bsz * distill_accum, accum_steps=distill_accum,
            attn_impl=attn, offset_cap=offset_cap, draft_params=dparams,
            start_step=start, on_step=on_step, log_every=min(50, ckpt_every))
        log(f"  draft loss: {hist[:2]} ... {hist[-2:]}")
        save_tree(dpath, dparams)
        part_clean(dpath)
    return params, dparams


def _dissect_divergence(eng, prompt, lens, van, tree, n_cmp):
    """First-divergence forensics for a failed exactness gate: replay the
    divergent position under the ENGINE's decode law — its cache layout
    (kv_quant="int8" forensics read a quantized cache, not a bf16 one) and
    its attn_impl — and report the target's top-2 logit margin there (see
    debug_window_lossless.py). The divergent token is reproduced by a real
    decode append over a prefix prefill, not by prefill logits alone, so
    the margin is measured under the same target function the engine's
    vanilla loop used."""
    import jax.numpy as jnp
    from longspec_tpu.models import llama as M
    a = van["output_ids"][0, :n_cmp]
    b = tree["output_ids"][0, :n_cmp]
    d = np.nonzero(a != b)[0]
    if not len(d):  # divergence in another batch row; report position only
        return {"first_div_pos": -1}
    i = int(d[0])
    plen = int(lens[0])
    cfg = eng.cfg
    impl = eng.ecfg.attn_impl
    if not (isinstance(impl, str) and impl in ("dense", "chunked", "pallas")):
        impl = "chunked"  # paged/sp engines: closest dense-layout law
    prefix = np.concatenate([np.asarray(prompt[0][:plen]), np.asarray(a[:i])])
    state = eng.init_state(1, len(prefix) + 8, jnp.bfloat16)
    if i == 0:
        # token 0 is sampled from prefill logits
        h, _, _ = M.forward_prefill(
            eng.params, cfg, jnp.asarray(prefix[None]),
            jnp.asarray([len(prefix)], jnp.int32), state.kv_k, state.kv_v,
            attn_impl=impl)
        lg = np.asarray(M.logits_at(eng.params, h[0, -1]))
    else:
        # token i came from an append of a[i-1] over the committed prefix
        pre = jnp.asarray(prefix[None, :-1])
        cl = jnp.asarray([len(prefix) - 1], jnp.int32)
        _, kv_k, kv_v = M.forward_prefill(eng.params, cfg, pre, cl,
                                          state.kv_k, state.kv_v,
                                          attn_impl=impl)
        h, _, _ = M.forward_append(
            eng.params, cfg, jnp.asarray([[int(prefix[-1])]], jnp.int32),
            cl[:, None], jnp.ones((1, 1, 1), bool), cl, kv_k, kv_v,
            attn_impl=impl)
        lg = np.asarray(M.logits_at(eng.params, h[:, 0])[0])
    top2 = np.argsort(lg)[-2:][::-1]
    margin = float(lg[top2[0]] - lg[top2[1]])
    del state
    return {
        "first_div_pos": i,
        "first_div_margin": round(margin, 6),
        "first_div_replay_top2": [int(top2[0]), int(top2[1])],
        "first_div_tokens": [int(a[i]), int(b[i])],   # [vanilla, tree]
        # classification: the cross-arm drift seed (the vanilla step and
        # the N-token verify attend the SAME keys under a different
        # prefix/suffix split; fp32-exact operands still differ ~1e-7,
        # amplified by bf16 cache-commit rounding feedback) flips greedy
        # ties whose margin is below ~1e-2. Such a flip is a numerical
        # tie between near-equal continuations — the reference's batched
        # verify has the identical structure (`llama_glide.py:1128-1175`
        # rows re-forwarded as a block) and would flip the same ties; it
        # never measures. Margins above 1e-2 indicate a real engine bug.
        "div_class": ("tie_flip" if margin < 1e-2 else "engine_bug"),
    }


def measure_row(name, eng, prompt, lens, gen, s_max, extras=False,
                eng_t1=None, eng_min=None):
    """Vanilla vs tree-spec on one engine; returns the row dict.

    Metric definitions match the reference harness
    (`inference_long-bench.py:257-260`): num counts target forward rounds
    (excluding the prefill-sampled token), count the extra draft-originated
    accepted tokens, so tok/s numerators are (count+num) for tree and num for
    vanilla — both the number of tokens emitted by the timed loop.

    `extras=True` additionally measures the reference's other two methods —
    chain (seq) speculation and the MagicDec/StreamingLLM self-speculation
    baseline (`--method seq` / `--method magicdec` in
    `inference_long-bench.py`) — so the row reproduces the reference's full
    method comparison, not just its headline.

    `eng_min` (same weights, uniform_decode_shape=False): the MAX-THROUGHPUT
    vanilla baseline — pure T=1 steps, no verify-shaped padding. The
    headline `speedup` divides by the FASTER of the two vanillas, so the
    padded same-law arm can never inflate the ratio; the losslessness gate
    still compares same-law tokens (cross-law one-ulp tie flips are exactly
    what uniform_decode_shape exists to rule out).
    """
    log(f"[{name}] vanilla decode...")
    van = eng.vanilla_generate(prompt, lens, max_gen_len=gen, s_max=s_max)
    beat()
    van = eng.vanilla_generate(prompt, lens, max_gen_len=gen, s_max=s_max)
    van_tps = van["num"] / van["elapsed"]
    beat()
    van_min_tps = None
    if eng_min is not None:
        log(f"[{name}] vanilla decode (min-shape baseline)...")
        vm = eng_min.vanilla_generate(prompt, lens, max_gen_len=gen,
                                      s_max=s_max)
        beat()
        vm = eng_min.vanilla_generate(prompt, lens, max_gen_len=gen,
                                      s_max=s_max)
        van_min_tps = vm["num"] / vm["elapsed"]
        del vm
        beat()
    base_tps = max(van_tps, van_min_tps or 0.0)

    log(f"[{name}] tree-spec decode...")
    tree = eng.tree_spec_generate(prompt, lens, max_gen_len=gen, s_max=s_max)
    beat()
    tree = eng.tree_spec_generate(prompt, lens, max_gen_len=gen, s_max=s_max)
    tree_tps = (tree["count"] + tree["num"]) / tree["elapsed"]
    accept = (tree["count"] + tree["num"]) / max(tree["num"], 1)

    n_cmp = int(min(van["num"], tree["count"] + tree["num"], gen - 1))
    lossless = bool(np.array_equal(van["output_ids"][:, :n_cmp],
                                   tree["output_ids"][:, :n_cmp]))
    row = {
        "name": name,
        "ctx": int(lens.max()),
        "gen": gen,
        "speedup": round(float(tree_tps / base_tps), 4),
        "mean_accept": round(float(accept), 4),
        "vanilla_tok_s": round(float(base_tps), 2),
        "tree_tok_s": round(float(tree_tps), 2),
        "lossless": lossless,
    }
    if van_min_tps is not None:
        # provenance: both baselines, so the conservative ratio is auditable
        row["vanilla_samelaw_tok_s"] = round(float(van_tps), 2)
        row["vanilla_minshape_tok_s"] = round(float(van_min_tps), 2)
    if not lossless:
        # dissect the FIRST divergence: replay the vanilla prefix through a
        # fresh prefill and record the top-2 logit margin there. A margin
        # within bf16 verify-vs-decode noise (different reduction orders for
        # T=1 append vs T=N tree verify) is a numerical tie flip, not an
        # engine-losslessness failure — report the evidence either way.
        row.update(_dissect_divergence(eng, prompt, lens, van, tree, n_cmp))

    if extras:
        for label, fn in (("chain", eng.spec_generate),
                          ("magicdec", eng.magicdec_generate)):
            log(f"[{name}] {label} decode...")
            try:
                r = fn(prompt, lens, max_gen_len=gen, s_max=s_max)
            except NotImplementedError as e:
                log(f"[{name}] {label} skipped: {e}")
                row[f"{label}_skipped"] = str(e)
                continue
            beat()
            r = fn(prompt, lens, max_gen_len=gen, s_max=s_max)
            beat()
            tps = (r["count"] + r["num"]) / r["elapsed"]
            acc = (r["count"] + r["num"]) / max(r["num"], 1)
            nc = int(min(van["num"], r["count"] + r["num"], gen - 1))
            row[f"{label}_tok_s"] = round(float(tps), 2)
            row[f"{label}_accept"] = round(float(acc), 4)
            row[f"{label}_speedup"] = round(float(tps / base_tps), 4)
            ll = bool(np.array_equal(
                van["output_ids"][:, :nc], r["output_ids"][:, :nc]))
            row[f"{label}_lossless"] = ll
            if not ll:
                # same forensics as the tree gate: a tiny replayed top-2
                # margin marks a bf16 verify-vs-decode tie flip, not an
                # acceptance-logic failure
                row.update({f"{label}_{k}": v for k, v in _dissect_divergence(
                    eng, prompt, lens, van, r, nc).items()})

    if eng_t1 is not None:
        # stochastic (T=1) tree speculation — the reference reports ~2.5x
        # at T=1 vs the (temperature-independent) autoregressive baseline
        # (`index.html:292`); output-law exactness at T>0 is CI-gated by the
        # engine-level chi-square test (tests/test_stochastic.py), so the
        # bench only measures throughput/accept here
        log(f"[{name}] tree-spec decode @ T=1...")
        t1 = eng_t1.tree_spec_generate(prompt, lens, max_gen_len=gen,
                                       s_max=s_max)
        beat()
        t1 = eng_t1.tree_spec_generate(prompt, lens, max_gen_len=gen,
                                       s_max=s_max)
        beat()
        t1_tps = (t1["count"] + t1["num"]) / t1["elapsed"]
        row["t1_tree_tok_s"] = round(float(t1_tps), 2)
        row["t1_accept"] = round(float((t1["count"] + t1["num"])
                                       / max(t1["num"], 1)), 4)
        row["t1_speedup"] = round(float(t1_tps / base_tps), 4)

    log(f"[{name}] {json.dumps(row)}")
    return row


def git_head():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=10).stdout.strip() or None
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU-friendly run")
    ap.add_argument("--rows", type=str,
                    default="easy_8k,hard_8k,hard_32k,long_128k,long_262k",
                    help="comma-separated subset of " + ",".join(SPECS))
    ap.add_argument("--train", action="store_true",
                    help="(re)train missing model caches. WITHOUT this flag "
                    "the bench NEVER trains: rows whose model pair is absent "
                    "are skipped — the driver path must always finish with a "
                    "parseable JSON inside its time budget")
    ap.add_argument("--headline", type=str, default="hard_32k",
                    help="row whose numbers head the final JSON (falls back "
                    "to the last measured row if absent)")
    ap.add_argument("--budget-s", type=float, default=5400,
                    help="soft wall-clock budget: once exceeded, remaining "
                    "un-measured rows are skipped and the JSON is emitted "
                    "from what finished (ignored under --train)")
    ap.add_argument("--gen", type=int, default=None,
                    help="tokens to generate per row (default: the row's "
                    "SPECS gen, else 256)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--attn", type=str, default=None,
                    help="engine (decode/verify) attention impl; default = "
                    "each row's measured-best (SPECS attn_best)")
    ap.add_argument("--train-attn", type=str, default="chunked",
                    help="attention impl for target pretraining + distill "
                    "(cache contents are attn-agnostic params; kept chunked "
                    "— its backward is the memory-tuned path)")
    # int8 draft proposals measured on-chip at hard_8k: speedup 2.16->2.43,
    # accept unchanged (3.57->3.62), lossless (the draft only PROPOSES;
    # target verification is untouched, so T=0 output is exact regardless)
    ap.add_argument("--draft-head", type=str, default="int8")
    ap.add_argument("--draft-compute", type=str, default="int8")
    ap.add_argument("--tree-shape", type=str, default=None,
                    help="default = each row's measured-best (SPECS "
                    "tree_best, falling back to the reference's 4,16^4)")
    ap.add_argument("--kv-quant", type=str, default=None,
                    choices=[None, "none", "int8"],
                    help="target KV cache storage: none | int8 "
                    "(ops/quantkv.py; spec-vs-vanilla exactness preserved); "
                    "default = each row's SPECS kv_quant, else none")
    ap.add_argument("--decode-precision", type=str, default="bf16_pinned",
                    choices=["highest", "high", "bf16_pinned"],
                    help="decode/verify attention matmul law "
                    "(EngineConfig.decode_precision): exactness identical "
                    "(arm-deterministic) in all three; speed and the "
                    "precise target function differ")
    ap.add_argument("--decode-dtype", type=str, default="fp32",
                    choices=["fp32", "native"],
                    help="decode/verify residual-stream law (config.py "
                    "decode_dtype). 'native' keeps the residual in bf16 — "
                    "faster on both arms; lossless iff the pinned-cast law "
                    "holds (validated by scripts/bitdiff_arms.py)")
    ap.add_argument("--uniform-decode-shape", type=int, default=1,
                    help="EngineConfig.uniform_decode_shape (1 = the shared "
                    "verify-shaped decode program, the structural "
                    "losslessness law; 0 = legacy minimal shapes)")
    ap.add_argument("--target-quant", type=str, default=None,
                    choices=["int8"],
                    help="override the row's frozen-target weight quant "
                    "(BOTH arms see the identical redefined target, like "
                    "the long rows' target_quant spec — halves the "
                    "dominant per-step weight read)")
    ap.add_argument("--kv-ring", type=int, default=None,
                    help="override the row's EngineConfig.kv_ring (O(window) "
                    "target ring cache); requires --prefill-seg if the row "
                    "spec has none")
    ap.add_argument("--prefill-seg", type=int, default=None,
                    help="override the row's EngineConfig.prefill_seg")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--fresh-rows", action="store_true",
                    help="re-measure rows even when a cached row result "
                    "matching the cached models exists")
    args = ap.parse_args()
    def resolve_row_cfg(sp):
        """(attn, tree_shape, kv_quant, gen): CLI override > row spec."""
        attn = args.attn or sp.get("attn_best", "chunked")
        ts = args.tree_shape or sp.get("tree_best", "4,16,16,16,16")
        kvq = args.kv_quant or sp.get("kv_quant", "none")
        gen = args.gen if args.gen is not None else sp.get("gen", 256)
        return attn, tuple(int(x) for x in ts.split(",")), kvq, gen

    global WD
    # --train compiles the seq-16384 unrolled full-param training program
    # from scratch whenever model code changed (persistent-cache miss) —
    # XLA takes 25-40 min with NO heartbeats, which the 25-min watchdog
    # read as a wedge (two restart loops observed round 3). Training gets
    # a 70-min leash; measure-only keeps the tight one.
    WD = Watchdog(stall_s=4200 if args.train else 1500)

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"  # override ambient axon setting

    import jax
    import jax.numpy as jnp
    if args.smoke:
        # the remote-TPU site hook force-selects its backend regardless of
        # env; deregister it before first backend init (see tests/conftest.py)
        import jax._src.xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from longspec_tpu.config import ModelConfig, DraftConfig, EngineConfig
    from longspec_tpu.engine.engine import SpecEngine
    from longspec_tpu.train.synthetic import (make_markov_lm, make_markov2_lm,
                                              sample_corpus_fast, sample_corpus2)

    t0 = time.time()
    cache_dir = DEFAULT_CACHE
    os.makedirs(cache_dir, exist_ok=True)

    if args.smoke:
        cfg = ModelConfig(vocab_size=503, hidden_size=128, intermediate_size=256,
                          num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
                          max_position_embeddings=4096, eos_token_id=1)
        dcfg = DraftConfig(window=64)
        ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=4, temperature=0.0,
                            attn_impl=args.attn or "chunked",
                            draft_head=args.draft_head,
                            draft_compute=args.draft_compute)
        succ, probs = make_markov_lm(cfg.vocab_size, seed=7,
                                     n_states=cfg.vocab_size - 2)
        corpus = sample_corpus_fast(succ, probs, 64, 96, seed=8)
        params, dparams = get_models(
            cfg, dcfg, corpus, cache_dir, "v5_smoke2_2x128x256",
            target_steps=200, distill_steps=200, lr=1e-3, train_bsz=8,
            attn=args.train_attn, no_cache=args.no_cache)
        eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
        prompt = sample_corpus_fast(succ, probs, args.batch, 192, seed=999)
        lens = np.full((args.batch,), 192, np.int32)
        gen = min(args.gen or 256, 48)
        rows = [measure_row("smoke", eng, prompt, lens, gen,
                            192 + gen + ecfg.tree_size + 16, extras=True)]
    else:
        cfg = big_model_config()
        dcfg = DraftConfig(window=512)
        names = [n for n in args.rows.split(",") if n]
        # --headline none: measure rows without the extras sweep (chain +
        # magicdec + T=1) — used for alternate-impl row variants where only
        # the tree/vanilla comparison is wanted
        headline_name = (None if args.headline == "none"
                         else args.headline if args.headline in names
                         else names[-1])

        def row_result_path(name, attn, ts, kvq, gen):
            key = (f"{name}_g{gen}_b{args.batch}_{attn}"
                   f"_{args.draft_head}{args.draft_compute}"
                   f"_t{'x'.join(map(str, ts))}")
            if SPECS[name]["window"]:
                key += f"_sw{SPECS[name]['window']}"
            if kvq != "none":
                key += f"_kv{kvq}"
            if args.target_quant or SPECS[name].get("target_quant"):
                key += f"_w{args.target_quant or SPECS[name]['target_quant']}"
            if args.kv_ring or SPECS[name].get("kv_ring"):
                key += f"_ring{args.kv_ring or SPECS[name]['kv_ring']}"
            if args.decode_dtype != "fp32":
                key += f"_dd{args.decode_dtype}"
            if args.decode_precision != "highest":
                key += f"_dp{args.decode_precision}"   # historical key rule:
                # unsuffixed row files were measured under "highest"
            if not args.uniform_decode_shape:
                key += "_minshape"
            return os.path.join(cache_dir, f"row_{key}.json")

        rows = []
        for name in names:
            sp = SPECS[name]
            row_attn, row_tree, row_kvq, row_gen = resolve_row_cfg(sp)
            ecfg = EngineConfig(tree_shape=row_tree, gamma=4,
                                temperature=0.0, attn_impl=row_attn,
                                draft_head=args.draft_head,
                                draft_compute=args.draft_compute,
                                kv_quant=row_kvq,
                                decode_dtype=args.decode_dtype,
                                decode_precision=args.decode_precision,
                                uniform_decode_shape=bool(
                                    args.uniform_decode_shape),
                                prefill_seg=(args.prefill_seg
                                             or sp.get("prefill_seg")),
                                kv_ring=args.kv_ring or sp.get("kv_ring"))
            lang, n_states, seq, ctx = (sp["lang"], sp["n_states"],
                                        sp["seq"], sp["ctx"])
            tag = row_tag(name)
            # reuse a row measured against the SAME cached model pair: the
            # tunnel can wedge any long device call, so finished rows are
            # persisted and restarts (and the driver's end-of-round run)
            # skip straight to unfinished work
            is_head = name == headline_name
            rpath = row_result_path(name, row_attn, row_tree, row_kvq,
                                    row_gen)
            tpath_c, dpath_c = row_cache_paths(name, cache_dir)
            if (not args.no_cache and not args.fresh_rows
                    and os.path.exists(rpath) and os.path.exists(tpath_c)
                    and os.path.exists(dpath_c)):
                with open(rpath) as f:
                    row = json.load(f)
                if not row_is_fresh(rpath, tpath_c, dpath_c, row):
                    row = {}
                # the headline row must carry every extras field the
                # summary reads — a stale cached row missing chain or T=1
                # measurements is re-measured, not reused
                if row and (not is_head or ("chain_tok_s" in row
                                            and "t1_tree_tok_s" in row)):
                    if row_is_stale(row):
                        # label, don't refuse: the driver path must always
                        # produce a final JSON, but a row measured before
                        # source changes cannot claim to describe HEAD
                        row["stale"] = True
                        log(f"[{name}] WARNING: cached row predates "
                            f"longspec_tpu/ changes (measured at "
                            f"{row.get('_commit')}) — labeled stale; run "
                            f"--fresh-rows for current evidence")
                    log(f"[{name}] reusing cached row result {row}")
                    rows.append(row)
                    WD.set_fallback(summarize(rows, headline_name, cfg, t0,
                                              partial=True))
                    continue
            models_cached = (os.path.exists(tpath_c)
                             and os.path.exists(dpath_c))
            if not models_cached and not args.train:
                log(f"[{name}] SKIPPED: model caches missing "
                    f"({os.path.basename(tpath_c)}) and --train not given")
                rows.append({"name": name, "ctx": ctx,
                             "skipped": "model cache missing (run "
                             "scripts/bench_supervisor.sh to train)"})
                continue
            if not args.train and time.time() - t0 > args.budget_s:
                log(f"[{name}] SKIPPED: over --budget-s "
                    f"({time.time() - t0:.0f}s elapsed)")
                rows.append({"name": name, "ctx": ctx,
                             "skipped": "wall-clock budget exhausted"})
                continue
            if lang == "easy":
                succ, probs = make_markov_lm(cfg.vocab_size, seed=7,
                                             n_states=n_states)
                sample = lambda n, s, seed: sample_corpus_fast(
                    succ, probs, n, s, seed=seed)
            else:
                succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                                n_states=n_states,
                                                branch_frac=0.2)
                sample = lambda n, s, seed: sample_corpus2(
                    succ2, probs2, n, s, seed=seed)
            if models_cached and not args.no_cache:
                # measure-only: load the pair without touching training code
                params, dparams = load_tree(tpath_c), load_tree(dpath_c)
                log(f"[{tag}] loaded cached target+draft")
            else:
                n_seqs = max(96, min(768, (48 * n_states * n_states) // seq))
                log(f"[{name}] sampling corpus ({n_seqs} x {seq})...")
                corpus = sample(n_seqs, seq, 8)
                params, dparams = get_models(
                    cfg, dcfg, corpus, cache_dir, tag,
                    target_steps=sp["target_steps"],
                    distill_steps=sp["distill_steps"], lr=sp["lr"],
                    train_bsz=1, attn=args.train_attn,
                    no_cache=args.no_cache, offset_cap=sp["offset_cap"],
                    distill_accum=sp["distill_accum"],
                    ckpt_every=sp.get("ckpt_every", 100))
                del corpus
            # decode-time sliding windows (see SPECS notes): the IDENTICAL
            # model for vanilla and every speculative method
            cfg_d, dcfg_d = cfg, dcfg
            if sp["window"]:
                import dataclasses
                cfg_d = dataclasses.replace(cfg, sliding_window=sp["window"],
                                            attn_sinks=4)
                dcfg_d = dataclasses.replace(dcfg, ca_window=sp["window"],
                                             ca_anchors=4)
            if sp.get("draft_ring"):
                import dataclasses
                dcfg_d = dataclasses.replace(dcfg_d,
                                             ring_size=sp["draft_ring"])
            # the headline row also measures chain + magicdec + T=1 tree —
            # the reference's full method comparison at north-star context.
            # A row that CRASHES the device (observed: long_262k killed the
            # TPU worker mid-decode) must not take the whole bench down with
            # an unhandled traceback — the final JSON still prints from the
            # rows measured/reused so far (round-2 parsed=null postmortem).
            eng = eng_t1 = None
            try:
                if (args.target_quant or sp.get("target_quant")) == "int8":
                    from longspec_tpu.ops.quantparams import (
                        quantize_target_params)
                    import jax as _jax
                    params = _jax.jit(quantize_target_params)(params)
                eng = SpecEngine(params, dparams, cfg_d, dcfg_d, ecfg)
                import dataclasses as _dc
                eng_min = None
                if ecfg.uniform_decode_shape:
                    # max-throughput vanilla baseline (pure T=1 steps):
                    # the headline ratio divides by the faster vanilla
                    eng_min = SpecEngine(params, dparams, cfg_d, dcfg_d,
                                         _dc.replace(
                                             ecfg,
                                             uniform_decode_shape=False))
                if is_head:
                    # proposal_sharpness 0.5: measured-best T=1 config
                    # (t1_study_r5.log, hard_32k d7: accept 3.59 / 191.0
                    # tok/s vs 3.32 / 162.2 at sharpness 1.0; still the
                    # EXACT target law — the verifier's accept ratios use
                    # the same sharpened proposal q', engine/verify.py)
                    eng_t1 = SpecEngine(params, dparams, cfg_d, dcfg_d,
                                        _dc.replace(ecfg, temperature=1.0,
                                                    proposal_sharpness=0.5))
                prompt = sample(args.batch, ctx, 999)
                lens = np.full((args.batch,), ctx, np.int32)
                row = measure_row(name, eng, prompt, lens, row_gen,
                                  ctx + row_gen + ecfg.tree_size + 16,
                                  extras=is_head, eng_t1=eng_t1,
                                  eng_min=eng_min)
            except Exception as e:  # noqa: BLE001 — device faults included
                log(f"[{name}] MEASUREMENT FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")
                rows.append({"name": name, "ctx": ctx,
                             "error": f"{type(e).__name__}: {str(e)[:200]}"})
                WD.set_fallback(summarize(rows, headline_name, cfg, t0,
                                          partial=True))
                del eng, eng_t1, params, dparams
                gc.collect()
                continue
            row["attn"] = row_attn
            row["tree_shape"] = "x".join(map(str, row_tree))
            if args.decode_precision != "highest":
                row["decode_precision"] = args.decode_precision
            if row_kvq != "none":
                row["kv_quant"] = row_kvq
            if args.target_quant or sp.get("target_quant"):
                row["target_quant"] = args.target_quant or sp["target_quant"]
            # provenance: which code + model bytes produced these numbers
            # (scripts/results_table.py renders these into README)
            row["_commit"] = git_head()
            row["_date"] = time.strftime("%Y-%m-%d %H:%M:%SZ", time.gmtime())
            row["_tfp"] = fingerprint(tpath_c)
            row["_dfp"] = fingerprint(dpath_c)
            rows.append(row)
            with open(rpath + ".tmp", "w") as f:
                json.dump(row, f)
            os.replace(rpath + ".tmp", rpath)
            WD.set_fallback(summarize(rows, headline_name, cfg, t0,
                                      partial=True))
            # drop this row's 5GB of device buffers before the next row loads
            del eng, eng_t1, eng_min, params, dparams
            gc.collect()

    print(json.dumps(summarize(rows, headline_name if not args.smoke
                               else "smoke", cfg, t0)))


def summarize(rows, headline_name, cfg, t0, partial=False):
    """Final one-line JSON from the measured rows. The headline falls back
    to the last row that actually has numbers, so a skipped headline never
    yields an unparseable result.

    The printed line must stay SMALL (< ~1 kB): the driver tail-captures
    stdout and the round-3 line — which inlined every row — overflowed the
    capture, leaving BENCH_r03.json with parsed=null at rc=0. Full rows go
    to bench_rows.json; the stdout line carries only the headline plus a
    pointer to that file."""
    head = None
    for r in rows:
        if r.get("name") == headline_name and "speedup" in r:
            head = r
    if head is None:
        measured = [r for r in rows if "speedup" in r]
        head = measured[-1] if measured else None
    rows_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_rows.json")
    try:
        with open(rows_file + ".tmp", "w") as f:
            json.dump({"rows": rows, "partial": partial,
                       "headline_row": head["name"] if head else None,
                       "model": f"llama-{cfg.num_layers}L-{cfg.hidden_size}h",
                       "setup_s": round(time.time() - t0, 1)}, f, indent=1)
        os.replace(rows_file + ".tmp", rows_file)
    except OSError as e:  # never let row persistence kill the final line
        log(f"[summarize] could not write {rows_file}: {e}")
    result = {
        "metric": "tree_spec_speedup_vs_vanilla",
        "value": head["speedup"] if head else None,
        "unit": "x",
        "vs_baseline": (round(head["speedup"] / 2.67, 4) if head else None),
        "mean_accept": head["mean_accept"] if head else None,
        "vanilla_tok_s": head["vanilla_tok_s"] if head else None,
        "tree_tok_s": head["tree_tok_s"] if head else None,
        "lossless": head["lossless"] if head else None,
        "t1_speedup": head.get("t1_speedup") if head else None,
        "ctx": head["ctx"] if head else None,
        "gen": head["gen"] if head else None,
        "headline_row": head["name"] if head else None,
        "n_rows": len(rows),
        "rows_file": "bench_rows.json",
        "model": f"llama-{cfg.num_layers}L-{cfg.hidden_size}h",
        "setup_s": round(time.time() - t0, 1),
    }
    if partial:
        result["partial"] = True
    return result


if __name__ == "__main__":
    main()
