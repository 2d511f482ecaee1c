"""Render the convergence-ledger dashboard (assets/gallery/) from the
committed on-chip learning-dynamics JSONs — one small-multiples figure:
hole-L2 vs training step, train vs held-out, ±std bands (16-batch eval
protocol, scripts/ledger_common.py).

Every point was measured on the real TPU chip; this script only draws.
Re-run after any ledger refresh:  python scripts/render_convergence_fig.py

Colors are slots 1-2 of the validated reference palette (dataviz skill,
adjacent CVD dE 9.1 on the light surface).
"""
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "assets", "gallery", "convergence_ledgers.png")

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e8e7e3"
SPINE = "#d8d7d3"
TRAIN = "#2a78d6"   # categorical slot 1 (blue)
HELD = "#eb6834"    # categorical slot 2 (orange)

# Tags run_ledger writes -> training step (mid/final are the bigcorpus-
# family runs: 1638 train images -> 25 steps/epoch, checkpointEvery=32,
# niter=120 -> epochs 32/120 = steps 800/3000).
STEP = {"init": 0, "mid": 800, "final": 3000}


def _step(tag):
    return STEP[tag] if tag in STEP else int(tag.removeprefix("step"))


def _series(path, regime=None, ledger=None):
    """{split: ([step...], [hole_l2...], [std...])} sorted by step.

    A missing file (results not yet folded in) renders as an empty
    panel rather than breaking the whole figure.
    """
    try:
        rows = json.load(open(os.path.join(REPO, path)))
    except OSError:
        return {}
    out = {}
    for r in rows:
        if regime and r.get("regime") != regime:
            continue
        if ledger and r.get("ledger") != ledger:
            continue
        if "hole_l2_std" not in r:
            continue  # pre-round-4 4-batch rows: superseded, no dispersion
        out.setdefault(r["evalSplit"], []).append(
            (_step(r["ckpt"]), r["hole_l2"], r["hole_l2_std"]))
    return {k: tuple(zip(*sorted(v))) for k, v in out.items()}


PANELS = [
    ("center — 256 textures\n(memorizes the small corpus)",
     _series("heldout_results.json", regime="center")),
    ("center — 2048 textures\n(corpus-size control: generalizes)",
     _series("center_reeval_bc.json", regime="center")),
    ("center + conditionAdv D\n(conditioned head, round 5)",
     _series("center_reeval_ca.json", regime="center")),
    ("center + noiseGen join\n(nz=100 bottleneck noise, round 5)",
     _series("center_reeval_ng.json", regime="center")),
    ("video — predLen=2 clips\n(logo-mask fill)",
     _series("heldout_results.json", regime="video")),
    ("video3d — temporal 3D convs\n(predLen=4)",
     _series("heldout_results.json", regime="video3d")),
    ("logo — masked-pair model\n(held-out pair split)",
     _series("logo_split_results.json", regime="logo")),
    ("wholeim — 3x3 patch array\n(corner extrapolation, slowest)",
     _series("logo_wholeim_results.json", regime="wholeim")),
    ("wholeim 10k soak\n(save-free, device-resident data)",
     _series("wholeim_soak_results.json", regime="wholeim")),
    ("center 10k soak — 2048 textures\n(held-out peaks @1250, then drifts)",
     _series("center_soak_results.json", regime="center")),
    ("wholeim 30k soak\n(plateaus @~18k; D collapse harmless)",
     _series("wholeim_soak30k_results.json", regime="wholeim")),
    ("video3d 10k soak\n(still falling @10k — no overtraining)",
     _series("video3d_soak_results.json", regime="video3d")),
    ("logo 7.5k soak — pair split\n(held-out peaks @6804, then oscillates)",
     _series("logo_soak_results.json", regime="logo")),
    ("center 10k soak — 512 textures\n(onset ~1.2k like 2048; dips, recovers)",
     _series("center_soak512_results.json", regime="center")),
    ("logo 12.5k soak — finer scoring\n(oscillation band keeps rising)",
     _series("logo_soak12k_results.json", regime="logo")),
    ("center 30k soak — 2048 textures\n(double descent: trough @10k, recovers)",
     _series("center_soak30k_results.json", regime="center")),
    ("center 3k fine — 256 textures\n(75-step scoring: first-descent peak)",
     _series("center_soak256fine_results.json", regime="center")),
    ("video3d 30k soak\n(long-horizon plateau search)",
     _series("video3d_soak30k_results.json", regime="video3d")),
]
PANELS = [p for p in PANELS if p[1]]  # drop not-yet-landed result files


def main():
    ncols = 3
    nrows = (len(PANELS) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(11, 2.73 * nrows), dpi=120)
    fig.patch.set_facecolor(SURFACE)
    for ax in axes.flat[len(PANELS):]:
        ax.set_visible(False)
    for i, (ax, (title, data)) in enumerate(zip(axes.flat, PANELS)):
        ax.set_facecolor(SURFACE)
        for split, color, label in (("train", TRAIN, "train"),
                                    ("test", HELD, "held-out")):
            if split not in data:
                continue
            xs, ys, ss = data[split]
            lo = [y - s for y, s in zip(ys, ss)]
            hi = [y + s for y, s in zip(ys, ss)]
            ax.fill_between(xs, lo, hi, color=color, alpha=0.15, lw=0)
            ax.plot(xs, ys, color=color, lw=1.5, marker="o", ms=4.5,
                    label=label, clip_on=False)
            if i == 0:  # direct labels once; the shared legend covers the rest
                ax.annotate(label, (xs[-1], ys[-1]),
                            textcoords="offset points", xytext=(6, 2),
                            fontsize=8, color=INK)
        ax.set_title(title, fontsize=9, color=INK, pad=6)
        ax.set_ylim(0, 0.27)
        ax.margins(x=0.04)
        ax.grid(axis="y", color=GRID, lw=0.6)
        ax.set_axisbelow(True)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(SPINE)
        ax.tick_params(colors=INK2, labelsize=8)
        if i % ncols == 0:
            ax.set_ylabel("hole-L2", fontsize=8, color=INK2)
        if i + ncols >= len(PANELS):  # nothing rendered below this panel
            ax.set_xlabel("training step", fontsize=8, color=INK2)
    handles, labels = axes.flat[0].get_legend_handles_labels()
    fig.legend(handles, labels, loc="upper right", ncol=2, frameon=False,
               fontsize=9, labelcolor=INK, bbox_to_anchor=(0.99, 1.0))
    fig.suptitle("On-chip convergence ledgers — hole-L2 vs step "
                 "(16-batch eval, ±std bands; real TPU v5e)",
                 fontsize=11, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig(OUT, facecolor=SURFACE)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
