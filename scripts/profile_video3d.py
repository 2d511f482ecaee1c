"""Attribute the video3d per-FLOP efficiency gap (BASELINE.md: the 3D family
runs at ~77% of the 2D path's per-FLOP rate; compute-bound, so the gap is
potential headroom).

Method: time each video3d generator stage (the (3,4,4)/(1,2,2) convs, the
(T,4,4)-valid bottleneck matmul pair) forward and forward+backward in
isolation at the training shapes, and time a 2D (4,4)/(2,2) conv with the
SAME channel widths over B*T folded frames (= the channel-folded video
regime's work divided by its frame count) as the per-FLOP reference.  A 3D
stage at parity does 3x the 2D conv's FLOPs (temporal k=3) at 3x the time.

Timing rule (CLAUDE.md): every measurement ends with a float() fetch — on
the remote (axon) TPU backend block_until_ready does not wait.

Usage: timeout 580 python scripts/profile_video3d.py [batch]
       VF_SECTION=bott limits to the bottleneck pair (the only stage the
       full profile found below 2D per-FLOP parity) — used to confirm the
       row-starvation attribution at larger batch without re-timing all 23
       rows over the tunnel.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.ops.layers import conv2d
from video_filler_tpu.ops.layers3d import conv3d, conv3d_transpose


ITERS = 30


def time_scan(step, p, x, iters=None):
    """Time `step` ((params, x) -> scalar feedback) looped ON DEVICE via
    lax.scan inside one jit — per-call dispatch over the remote-TPU tunnel
    costs ~1-3 ms, which drowns small ops if the host loops (measured: every
    op "took" the dispatch floor).  The scan carries x perturbed by a scalar
    of the step's output, a real data dependence XLA cannot hoist; the added
    mean+scale is O(x) bandwidth, identical for the 2D/3D variants being
    ratioed.  Params are a jit ARGUMENT: closed-over weights ship inline in
    the remote compile request (the 0.5G-element bottleneck blew its length
    limit with HTTP 413)."""
    iters = iters or ITERS

    @jax.jit
    def run(p, x):
        def body(carry, _):
            fb = step(p, carry)
            return (carry * (1.0 + jnp.tanh(fb) * 1e-6)).astype(carry.dtype), None
        xf, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(xf.astype(jnp.float32))

    float(run(p, x))  # compile + execute + fetch
    t0 = time.perf_counter()
    float(run(p, x))
    return (time.perf_counter() - t0) / iters


def conv_flops(batch, t, h, w, cin, cout, kt, kh, kw, sh):
    """MACs*2 of a (kt,kh,kw) conv at stride (1,sh,sh), SAME padding."""
    oh, ow = h // sh, w // sh
    return 2.0 * batch * t * oh * ow * cin * cout * kt * kh * kw


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t, nef, nb = 4, 64, 4000
    dt = jnp.bfloat16
    widths = [64, 64, 128, 256, 512]
    s0 = 128
    if os.environ.get("VF_SMOKE") == "1":  # CPU API check: tiny everything
        global ITERS
        b, nb, dt, s0, ITERS = 1, 64, jnp.float32, 32, 2
        widths = [4, 4, 8, 8, 8]
    rs = np.random.RandomState(0)
    rows = []

    def bench(tag, layer, x, flops, pair=None, kind=None):
        """pair/kind tag each row for the ratio summary: every '3d' row is
        ratioed against the '2d' row sharing its pair key (explicit keys,
        not emission order — reordering a bench() call cannot mispair)."""
        p, s = layer.init(jax.random.PRNGKey(0))

        def fwd_step(p, x):
            y = layer.apply(p, s, x, train=False)[0]
            return jnp.mean(y.astype(jnp.float32))

        def fwdbwd_step(p, x):
            def loss(x):
                y = layer.apply(p, s, x, train=False)[0]
                return jnp.sum(jnp.square(y.astype(jnp.float32)))
            # grad wrt the INPUT chains the backward into the scan carry;
            # dW costs the same MACs as dX for a conv, so time fwd+dX and
            # scale by the fwd+dX FLOP count below.
            return jnp.mean(jax.grad(loss)(x).astype(jnp.float32))

        tf = time_scan(fwd_step, p, x)
        gtf = flops / tf / 1e12
        tb = time_scan(fwdbwd_step, p, x)
        # fwd + input-grad = 2x the forward FLOPs
        gtb = 2.0 * flops / tb / 1e12
        rows.append({"tag": tag, "pair": pair, "kind": kind,
                     "fwd_ms": tf * 1e3, "fwd_tfs": gtf,
                     "bwd_ms": tb * 1e3, "bwd_tfs": gtb})
        print(f"{tag:34s} fwd {tf * 1e3:8.3f} ms {gtf:6.2f} TF/s   "
              f"fwd+dX {tb * 1e3:8.3f} ms {gtb:6.2f} TF/s", flush=True)

    only_bott = os.environ.get("VF_SECTION") == "bott"

    # --- encoder stages: 3D (3,4,4)/(1,2,2) vs 2D (4,4)/(2,2) on B*T frames
    s_in, cin = s0, 3
    for i, w in enumerate(widths if not only_bott else []):
        x3 = jnp.asarray(rs.rand(b, t, s_in, s_in, cin) * 2 - 1, dt)
        f3 = conv_flops(b, t, s_in, s_in, cin, w, 3, 4, 4, 2)
        bench(f"3D enc conv{i} {s_in}^2 {cin}->{w}",
              conv3d(cin, w, (3, 4, 4), (1, 2, 2), (1, 1, 1), False, dt),
              x3, f3, pair=f"enc{i}", kind="3d")
        x2 = jnp.asarray(rs.rand(b * t, s_in, s_in, cin) * 2 - 1, dt)
        f2 = conv_flops(b * t, 1, s_in, s_in, cin, w, 1, 4, 4, 2)
        bench(f"2D ref conv{i} {s_in}^2 {cin}->{w}",
              conv2d(cin, w, 4, 2, 1, False, dt), x2, f2,
              pair=f"enc{i}", kind="2d")
        s_in //= 2
        cin = w

    # --- bottleneck pair: (T,4,4)-valid in/out matmuls
    cb = widths[-1]
    x3 = jnp.asarray(rs.rand(b, t, 4, 4, cb) * 2 - 1, dt)
    fb = 2.0 * b * cb * nb * t * 16
    bench(f"3D bott conv ({t},4,4)v {cb}->{nb}",
          conv3d(cb, nb, (t, 4, 4), (1, 1, 1), (0, 0, 0), False, dt), x3, fb,
          pair="bott", kind="3d")
    x2 = jnp.asarray(rs.rand(b * t, 4, 4, cb) * 2 - 1, dt)
    bench(f"2D ref bott (4,4)v {cb}->{nb}",
          conv2d(cb, nb, 4, 1, 0, False, dt), x2, fb,
          pair="bott", kind="2d")
    xb = jnp.asarray(rs.rand(b, 1, 1, 1, nb) * 2 - 1, dt)
    # up0 shares the bottleneck's 2D reference (equal-FLOP mirror matmul)
    bench(f"3D up0 convT ({t},4,4)v {nb}->{cb}",
          conv3d_transpose(nb, cb, (t, 4, 4), (1, 1, 1), (0, 0, 0),
                           False, dt), xb, fb, pair="bott", kind="3d")

    if only_bott:
        _print_ratios(rows)
        return

    # --- decoder stages: convT (3,4,4)/(1,2,2)
    from video_filler_tpu.ops.layers import conv2d_transpose
    dec_widths = widths[::-1]
    s_in = 4
    cin = cb
    for i, w in enumerate(dec_widths[1:] + [3], start=1):
        x3 = jnp.asarray(rs.rand(b, t, s_in, s_in, cin) * 2 - 1, dt)
        f3 = conv_flops(b, t, s_in * 2, s_in * 2, w, cin, 3, 4, 4, 2)
        bench(f"3D dec up{i} {s_in}^2 {cin}->{w}",
              conv3d_transpose(cin, w, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                               False, dt), x3, f3, pair=f"dec{i}", kind="3d")
        x2 = jnp.asarray(rs.rand(b * t, s_in, s_in, cin) * 2 - 1, dt)
        f2 = conv_flops(b * t, 1, s_in * 2, s_in * 2, w, cin, 1, 4, 4, 2)
        bench(f"2D ref up{i} {s_in}^2 {cin}->{w}",
              conv2d_transpose(cin, w, 4, 2, 1, False, dt), x2, f2,
              pair=f"dec{i}", kind="2d")
        s_in *= 2
        cin = w

    _print_ratios(rows)


def _print_ratios(rows):
    """Each 3D row vs the 2D row sharing its pair key (the bottleneck's two
    3D matmuls both ratio against the same equal-FLOP 2D reference)."""
    refs = {r["pair"]: r for r in rows if r["kind"] == "2d"}
    print("\nper-FLOP ratio (3D vs matching 2D, fwd / fwd+dX):")
    for r in rows:
        if r["kind"] != "3d":
            continue
        ref = refs.get(r["pair"])
        if ref is None:
            print(f"  {r['tag']:34s} (no 2D reference run)")
            continue
        print(f"  {r['tag']:34s} {r['fwd_tfs'] / ref['fwd_tfs']:5.2f}x fwd"
              f"   {r['bwd_tfs'] / ref['bwd_tfs']:5.2f}x dX")


if __name__ == "__main__":
    main()
