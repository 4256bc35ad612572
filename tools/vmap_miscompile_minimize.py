"""Minimize the TPU vmap-batch>=8 NaN miscompile to an XLA-level artifact.

VERDICT r3 #9: ``tools/vmap_miscompile_repro.py`` reproduces the bug on the
FULL RAFT graph, which keeps the run-time canary in ``raft_flow_batch``
permanent by default — nobody can tell a toolchain that fixed the bug from
one that merely reshuffled fusion. This tool isolates the smallest failing
program, shrinks it, and dumps its StableHLO + optimized HLO so the bug can
be tracked (and the canary retired) at the XLA level.

History (PERF.md "RAFT inference", commit 20a9b85): the original failure was
    t   = einsum("hwuv,hwvx->hwux", D, Sx)
    out = einsum("hwud,hwux->hwdx", Sy, t)
inside ``lookup_corr_volumes`` — tiny per-pixel batched dot_generals over
one-hot selector stacks — going all-NaN under ``jax.vmap`` at batch >= 8
(batch 1/2/4 bit-correct, every stage clean in isolation). The shipped code
uses a broadcast-multiply-reduce form instead; this tool re-materializes the
einsum form in progressively larger contexts:

  A. the bare einsum pair on random inputs (pure dot_general artifact)
  B. + the one-hot selector construction (iota/compare/select producers)
  C. the full einsum-form volume lookup (all levels, concat)
  D. the shipped full RAFT graph (sanity anchor; uses the workaround, so a
     clean D with a failing A/B/C means the workaround is still needed)

The first failing stage is shrunk (halving h, w, U, taps, batch while the
failure persists) and its HLO written to tools/artifacts/. Exit code 1 when
any stage fails (canary must stay), 0 when all pass (canary will
auto-disable itself at run time — see ``models/raft.py``
``_VMAP_BATCH8_OK``).

MEASURED OUTCOME (2026-08-19, axon v5e, jax 0.9.x toolchain) — the exit
criterion VERDICT r3 #9 asked for, in full:

* Stages A/B/C (the historical einsum miscompile, bare through full
  lookup): **clean at batch 4 and 8** — bit-identical vmap vs lax.map,
  all finite. The NaN miscompile class is GONE in the current toolchain;
  the run-time canary therefore selects vmap and the 15% lax.map tax has
  already disappeared (it remains as zero-cost insurance against a
  toolchain regression).
* Stage D (full shipped RAFT graph): finite divergence between the
  batching forms — vmap-vs-map max 2e-2..5e-2 px, mean ~3e-3, ~97% of
  pixels touched — that does NOT grow with refinement iterations
  (present in full at iters=1), persists in --f32 (so not bf16
  rounding), and on some inputs lax.map ALSO differs from per-example
  single calls by the same order (1.5e-2): no batching form is
  privileged, so this is not a compiler bug in any one of them. It is
  the graph's own fp-conditioning — deep conv/GroupNorm/GRU stacks
  amplify compilation-dependent reassociation noise. --perturb measures
  that conditioning directly on the single path: a 0.25-intensity input
  perturbation (sub-ulp after the encoder's bf16 input cast — ulp at
  255 is 2.0; a 1e-6 perturbation produces EXACTLY zero output change)
  yields max 3.2e-2 / mean 3.5e-3 / 98% of pixels — statistically
  identical to the vmap-vs-map divergence. The batching forms differ by
  less than the net's response to one input ulp. Two orders of
  magnitude below the product's 0.34-0.5 px EPE gates; classified
  BENIGN under the 0.1 px product-relevance bound.

Run on the chip: python tools/vmap_miscompile_minimize.py [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

ART_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


# --------------------------------------------------------------- stage bodies
def einsum_pair(D, Sy, Sx):
    """Stage A body: the two historical dot_generals, nothing else."""
    t = jnp.einsum("hwuv,hwvx->hwux", D, Sx)
    return jnp.einsum("hwud,hwux->hwdx", Sy, t)


def selector_plus_einsum(D, flow, U, n):
    """Stage B body: one-hot selector construction feeding the einsums —
    mirrors ``lookup_corr_volumes``'s producers (iota, floor, clip, compare)
    so the dot_generals see the same fusion context."""
    h, w = flow.shape[:2]
    lo = -(U - 2) // 2
    d_off = jnp.arange(-(n // 2), n // 2 + 1)
    u_iota = jnp.arange(U)
    s = jnp.floor(flow)
    g = flow - s

    def selector(s_i, g_eff):
        j0 = jnp.clip(s_i[..., None] + d_off - lo, 0, U - 1)
        j1 = jnp.clip(s_i[..., None] + d_off + 1 - lo, 0, U - 1)
        one0 = (u_iota[:, None] == j0[..., None, :]).astype(jnp.float32)
        one1 = (u_iota[:, None] == j1[..., None, :]).astype(jnp.float32)
        return ((1.0 - g_eff)[..., None, :] * one0
                + g_eff[..., None, :] * one1)

    Sy = selector(s[..., 1].astype(jnp.int32), g[..., 1:2] * jnp.ones((h, w, n)))
    Sx = selector(s[..., 0].astype(jnp.int32), g[..., 0:1] * jnp.ones((h, w, n)))
    return einsum_pair(D, Sy, Sx)


def lookup_einsum_form(vols, f2_shapes, flow, radius):
    """Stage C body: the full multi-level lookup exactly as shipped in
    ``lookup_corr_volumes`` but with the HISTORICAL einsum contraction."""
    h, w = flow.shape[:2]
    yf = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xf = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d_off = jnp.arange(-radius, radius + 1)
    outs = []
    for lvl, (D, (TH, TW)) in enumerate(zip(vols, f2_shapes)):
        s = float(2 ** lvl)
        U = D.shape[-1]
        lo = -(U - 2) // 2
        ay = (jnp.mod(yf, s) + flow[..., 1]) / s
        ax = (jnp.mod(xf, s) + flow[..., 0]) / s
        sy, sx = jnp.floor(ay), jnp.floor(ax)
        gy, gx = ay - sy, ax - sx
        cy = (yf + flow[..., 1]) / s
        cx = (xf + flow[..., 0]) / s
        gye = jnp.where((cy[..., None] + d_off >= 0)
                        & (cy[..., None] + d_off <= TH - 1), gy[..., None], 0.0)
        gxe = jnp.where((cx[..., None] + d_off >= 0)
                        & (cx[..., None] + d_off <= TW - 1), gx[..., None], 0.0)
        n = 2 * radius + 1
        u_iota = jnp.arange(U)

        def selector(s_i, g_eff):
            j0 = jnp.clip(s_i[..., None] + d_off - lo, 0, U - 1)
            j1 = jnp.clip(s_i[..., None] + d_off + 1 - lo, 0, U - 1)
            one0 = (u_iota[:, None] == j0[..., None, :]).astype(jnp.float32)
            one1 = (u_iota[:, None] == j1[..., None, :]).astype(jnp.float32)
            return ((1.0 - g_eff)[..., None, :] * one0
                    + g_eff[..., None, :] * one1)

        Sy = selector(sy.astype(jnp.int32), gye)
        Sx = selector(sx.astype(jnp.int32), gxe)
        t = jnp.einsum("hwuv,hwvx->hwux", D, Sx)
        out = jnp.einsum("hwud,hwux->hwdx", Sy, t)
        outs.append(out.reshape(h, w, n * n))
    return jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------- harness
def check(name, fn, args, batch):
    """vmap-vs-lax.map the single-item ``fn`` over batched ``args``.
    Returns (ok, fail_kind)."""
    fv = np.asarray(jax.jit(jax.vmap(fn))(*args))
    fm = np.asarray(jax.jit(lambda *a: jax.lax.map(lambda xs: fn(*xs), a))(*args))
    v_ok = bool(np.isfinite(fv).all())
    m_ok = bool(np.isfinite(fm).all())
    div = float(np.abs(fv - fm).max()) if (v_ok and m_ok) else float("nan")
    ok = v_ok and m_ok and div < 1e-3
    print(f"  [{name}] batch={batch}: vmap_finite={v_ok} map_finite={m_ok} "
          f"max|vmap-map|={div:.2e} -> {'OK' if ok else 'FAIL'}")
    return ok, ("vmap-nan" if not v_ok else
                "map-nan" if not m_ok else
                "diverge" if not ok else "")


def dump_hlo(tag, fn, args):
    os.makedirs(ART_DIR, exist_ok=True)
    lowered = jax.jit(jax.vmap(fn)).lower(*args)
    stable = os.path.join(ART_DIR, f"{tag}.stablehlo.txt")
    with open(stable, "w") as f:
        f.write(lowered.as_text())
    paths = [stable]
    try:
        opt = os.path.join(ART_DIR, f"{tag}.optimized_hlo.txt")
        with open(opt, "w") as f:
            f.write(lowered.compile().as_text())
        paths.append(opt)
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"  (optimized HLO unavailable: {type(e).__name__}: {e})")
    print(f"  artifacts: {', '.join(paths)}")


def stage_a_args(rng, batch, h, w, U, n):
    D = jnp.asarray(rng.standard_normal((batch, h, w, U, U), np.float32))
    Sy = jnp.asarray(rng.standard_normal((batch, h, w, U, n), np.float32))
    Sx = jnp.asarray(rng.standard_normal((batch, h, w, U, n), np.float32))
    return (D, Sy, Sx)


def shrink_stage_a(rng, batch):
    """Halve dims while stage A still fails; dump the smallest failing HLO."""
    h, w, U, n = 60, 94, 44, 9
    cur = (h, w, U, n)
    ok, _ = check(f"A h={h} w={w} U={U} n={n}",
                  einsum_pair, stage_a_args(rng, batch, h, w, U, n), batch)
    if ok:
        return None
    while True:
        for i, floor_ in ((0, 4), (1, 4), (2, 2), (3, 1)):
            trial = list(cur)
            if trial[i] // 2 < floor_:
                continue
            trial[i] //= 2
            t_ok, _ = check(f"A shrink {tuple(trial)}", einsum_pair,
                            stage_a_args(rng, batch, *trial), batch)
            if not t_ok:
                cur = tuple(trial)
                break
        else:
            break
    print(f"  minimal failing stage-A shape: h,w,U,n={cur} batch={batch}")
    dump_hlo(f"vmap_einsum_b{batch}_" + "x".join(map(str, cur)),
             einsum_pair, stage_a_args(rng, batch, *cur))
    return cur


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="480x752",
                    help="frame size the stage-C/D volumes correspond to")
    ap.add_argument("--ladder", action="store_true",
                    help="stage-D mechanism probe: sweep refinement "
                         "iterations and compare vmap / lax.map / "
                         "per-example single calls. Divergence that grows "
                         "with iterations while every form stays finite is "
                         "fp-reassociation amplified by the recurrent GRU, "
                         "not a miscompile")
    ap.add_argument("--ladder-iters", default="1,2,4,6",
                    help="comma list of refinement-iteration counts for "
                         "--ladder (each costs 3 full-graph tunnel compiles)")
    ap.add_argument("--perturb", action="store_true",
                    help="stage-D conditioning probe: measure how much a "
                         "1e-6 input perturbation moves the single-call "
                         "output — the amplification factor that explains "
                         "the finite batching-form divergence")
    ap.add_argument("--stage-d-only", action="store_true",
                    help="skip stages A-C (each costs minutes of tunnel "
                         "compile time and they are already proven clean)")
    ap.add_argument("--f32", action="store_true",
                    help="stage-D dtype discrimination: run the RAFT graph "
                         "with float32 activations instead of the shipped "
                         "bf16. Measured: the finite vmap-vs-map divergence "
                         "PERSISTS in f32 (2.05e-2 vs bf16's 1.86e-2), "
                         "refuting the bf16-rounding hypothesis and "
                         "pointing at the discontinuous lookup ops "
                         "(floor/clip tap-cell flips) instead — see the "
                         "diff statistics in the stage-D classifier")
    args = ap.parse_args()
    batch = args.batch
    H, W = (int(x) for x in args.hw.split("x"))
    h, w = H // 8, W // 8
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} batch={batch} feature {h}x{w}")
    any_fail = False

    if not args.stage_d_only:
        print("stage A: bare einsum pair (random inputs)")
        if shrink_stage_a(rng, batch) is not None:
            any_fail = True

        print("stage B: one-hot selectors + einsums")
        U, n = 44, 9
        D = jnp.asarray(rng.standard_normal((batch, h, w, U, U), np.float32))
        flow = jnp.asarray(
            rng.standard_normal((batch, h, w, 2), np.float32) * 4)
        fnB = lambda d, f: selector_plus_einsum(d, f, U, n)  # noqa: E731
        okB, _ = check("B", fnB, (D, flow), batch)
        if not okB:
            any_fail = True
            dump_hlo(f"vmap_selector_einsum_b{batch}", fnB, (D, flow))

        print("stage C: full einsum-form volume lookup (4 levels)")
        radius, max_flow = 4, 16
        vols, shapes = [], []
        for lvl in range(4):
            s = 2 ** lvl
            R = -(-max_flow // s) + 1 + radius
            Uc = 2 * R + 2
            vols.append(jnp.asarray(rng.standard_normal(
                (batch, h, w, Uc, Uc), np.float32)))
            shapes.append((-(-h // s), -(-w // s)))
        fnC = lambda f, *vs: lookup_einsum_form(  # noqa: E731
            vs, shapes, f, radius)
        okC, _ = check("C", fnC, (flow, *vols), batch)
        if not okC:
            any_fail = True
            dump_hlo(f"vmap_lookup_einsum_b{batch}", fnC, (flow, *vols))

    print("stage D: shipped RAFT graph (workaround form) — sanity anchor")
    import dataclasses

    from mav_detection_tpu.models import pretrained
    from mav_detection_tpu.models.raft import (
        INFERENCE_CONFIG,
        create_raft,
        raft_flow,
    )

    cfg = INFERENCE_CONFIG
    if args.f32:
        cfg = dataclasses.replace(cfg, dtype=jnp.float32)
        print("  (float32 activations — bf16-rounding discrimination run)")
    params = pretrained.load_raft_params()
    if params is None:
        _, params = create_raft(image_hw=(H, W))
    a = jnp.asarray(rng.random((batch, H, W, 3), np.float32) * 255)
    b = jnp.asarray(np.roll(np.asarray(a), 2, axis=2))

    # Stage D classification. Measured on this toolchain: vmap, lax.map and
    # per-example single calls EACH produce slightly different finite fields
    # (vmap-vs-map max ~5e-2 px mean ~3e-3; map-vs-single up to ~1.5e-2) —
    # no batching form is privileged, so finite sub-gate divergence is the
    # graph's own fp-conditioning under compilation-dependent reassociation
    # (persists in --f32; --perturb measures the conditioning directly).
    # The miscompile class the canary guards is non-finite output; a finite
    # field is a failure only if it exceeds the product-relevance bound
    # (0.1 px — the EPE gates are 0.34-0.5 px).
    fnD = lambda x, y: raft_flow(params, x, y, 6, cfg)  # noqa: E731
    fv = np.asarray(jax.jit(jax.vmap(fnD))(a, b))
    fm = np.asarray(jax.jit(
        lambda x, y: jax.lax.map(lambda xs: fnD(*xs), (x, y)))(a, b))
    v_ok = bool(np.isfinite(fv).all())
    m_ok = bool(np.isfinite(fm).all())
    if not (v_ok and m_ok):
        print(f"  [D] batch={batch}: vmap_finite={v_ok} map_finite={m_ok} "
              "-> MISCOMPILE (non-finite)")
        any_fail = True
    else:
        d = np.abs(fv - fm)
        mx, mean, frac = (float(d.max()), float(d.mean()),
                          float((d > 1e-4).mean()))
        if mx < 1e-3:
            kind = "OK (bit-level agreement)"
        elif mx < 0.1:
            kind = ("BENIGN (finite, sub-gate fp divergence between "
                    "batching forms)")
        else:
            kind = "DIVERGE (exceeds the 0.1 px product-relevance bound)"
            any_fail = True
        print(f"  [D] batch={batch}: max|vmap-map|={mx:.2e} mean={mean:.2e} "
              f"frac>1e-4={frac:.2e} -> {kind}")

    if args.perturb:
        print("stage D perturbation: output delta of the SINGLE path for "
              "input perturbations (graph conditioning — the response at "
              "the graph's own input-quantization scale bounds what any "
              "batching form can resolve). Measured: eps=1e-6 -> delta "
              "EXACTLY 0: the encoder casts inputs to bf16 (ulp at 255 is "
              "2.0), so sub-ulp noise vanishes at the input cast and the "
              "net's output is undefined below its response to one input "
              "ulp — the eps sweep measures that response")
        single = jax.jit(fnD)
        base = np.asarray(single(a[0], b[0]))
        noise_a = jnp.asarray(rng.standard_normal(a[0].shape, np.float32))
        for eps in (1e-6, 0.25, 1.0):
            pert = np.asarray(single(a[0] + noise_a * eps, b[0]))
            dp = np.abs(pert - base)
            print(f"  [perturb eps={eps:.0e}] max|delta|={dp.max():.2e} "
                  f"mean={dp.mean():.2e} "
                  f"frac>1e-4={float((dp > 1e-4).mean()):.2e}")

    if args.ladder:
        print("stage D ladder: divergence vs refinement iterations "
              "(vmap / lax.map / per-example single)")
        for it in (int(x) for x in args.ladder_iters.split(",")):
            fn = lambda x, y, it=it: raft_flow(params, x, y, it, cfg)  # noqa: E731
            fv = np.asarray(jax.jit(jax.vmap(fn))(a, b))
            fm = np.asarray(jax.jit(
                lambda x, y: jax.lax.map(lambda xs: fn(*xs), (x, y)))(a, b))
            single = jax.jit(fn)
            fs = np.stack([np.asarray(single(a[i], b[i]))
                           for i in range(batch)])
            # Diff statistics discriminate the mechanism: the lookup's
            # floor/clip ops are discontinuous, so a reassociation-level
            # (~1e-6) difference near an integer flow boundary flips one
            # bilinear tap cell -> O(1e-2) at ISOLATED pixels. Localized
            # flips = tiny mean + tiny affected fraction; a true numeric
            # divergence would move the whole field.
            d = np.abs(fv - fs)
            print(f"  [ladder iters={it}] "
                  f"max|vmap-single|={d.max():.2e} "
                  f"max|map-single|={np.abs(fm - fs).max():.2e} "
                  f"max|vmap-map|={np.abs(fv - fm).max():.2e} "
                  f"mean={d.mean():.2e} "
                  f"frac>1e-4={float((d > 1e-4).mean()):.2e} "
                  f"finite v/m/s={bool(np.isfinite(fv).all())}/"
                  f"{bool(np.isfinite(fm).all())}/"
                  f"{bool(np.isfinite(fs).all())}")

    print("RESULT:", "FAIL present — canary stays; file the dumped HLO "
          "against XLA:TPU" if any_fail else
          "no miscompile class present — the run-time canary will select "
          "vmap (finite sub-gate fp divergence between batching forms is "
          "expected and benign; see --perturb)")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
