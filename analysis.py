#!/usr/bin/env python3
"""Regenerate analysis figures from durable artifacts.

Reference analog: analysis.py (every paper figure from committed JSON
artifacts, fixed color conventions). Each panel renders IF its artifact
exists; missing artifacts are skipped with a note, so the script is safe to
run at any stage of a training campaign.

Inputs (any subset):
  model/*/history.json                    training curves
  analysis/overlap_benchmark.json         per-rank calibration + runtimes
  analysis/twin_grid.json                 amortization-bias map
  reports/diag/diagnostics.json           coverage/SBC audit
  BENCH_r*.json                           per-round bench results

Usage: python analysis.py [--outdir figures]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

C_BLUE, C_RED, C_GREY = "#4477aa", "#cc3311", "#777777"
C_GREEN = "#228833"


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def fig_training_curves(outdir, runs):
    plt = _mpl()
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for name, hist in runs.items():
        # step-keyed histories (e.g. long_bns) don't fit the epoch panels
        if not (hist and isinstance(hist[0], dict) and "epoch" in hist[0]):
            continue
        ep = [h["epoch"] for h in hist]
        axes[0].plot(ep, [h["val_nll"] for h in hist], label=name)
        axes[1].plot(ep, [h.get("shuffle_delta_nll", 0) for h in hist],
                     label=name)
        axes[2].plot(ep, [h.get("spurious_railing", 0) for h in hist],
                     label=name)
    for ax, title in zip(axes, ("val NLL", "shuffle-ΔNLL (conditioning)",
                                "spurious railing")):
        ax.set_title(title)
        ax.set_xlabel("epoch")
        ax.legend(fontsize=7)
    axes[2].axhline(0.10, color=C_RED, ls="--", lw=1, label="gate")
    fig.tight_layout()
    fig.savefig(outdir / "training_curves.png", dpi=110)
    plt.close(fig)
    return "training_curves.png"


def fig_overlap(outdir, data):
    plt = _mpl()
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    pr = data.get("per_rank", {})
    keys = sorted(pr)
    axes[0].bar(range(len(keys)), [pr[k]["cov90_mean"] for k in keys],
                color=C_BLUE)
    axes[0].axhline(0.9, color=C_RED, ls="--", lw=1)
    axes[0].set_xticks(range(len(keys)))
    axes[0].set_xticklabels(keys, rotation=45, fontsize=7)
    axes[0].set_title("cov90 per (multiplicity, rank)")
    for b in data.get("dt_bins", []):
        axes[1].plot([sum(b["dt_bin"]) / 2] * 2,
                     [b["rank0_cov90"], b["rank1_cov90"]], "o-",
                     color=C_GREY, ms=4)
    axes[1].axhline(0.9, color=C_RED, ls="--", lw=1)
    axes[1].set_title("cov90 vs |dt| (rank0 top, rank1 bottom)")
    axes[1].set_xlabel("|dt| [s]")
    rt = data.get("runtime", {})
    axes[2].bar(range(len(rt)), list(rt.values()), color=C_BLUE)
    axes[2].set_xticks(range(len(rt)))
    axes[2].set_xticklabels(list(rt), fontsize=8)
    axes[2].set_title("median k-rank wall time [s]")
    fig.tight_layout()
    fig.savefig(outdir / "overlap_benchmark.png", dpi=110)
    plt.close(fig)
    return "overlap_benchmark.png"


def fig_twin_grid(outdir, data):
    plt = _mpl()
    import numpy as np
    g = data["grid"]
    mcs = sorted({p["mc"] for p in g})
    qs = sorted({p["q"] for p in g})
    z = np.zeros((len(qs), len(mcs)))
    for p in g:
        z[qs.index(p["q"]), mcs.index(p["mc"])] = p["mc_bias_frac_mean"]
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(z, origin="lower", aspect="auto", cmap="RdBu_r",
                   vmin=-0.3, vmax=0.3,
                   extent=[min(mcs), max(mcs), min(qs), max(qs)])
    fig.colorbar(im, label="chirp-mass bias fraction")
    ax.set_xlabel("Mc")
    ax.set_ylabel("q")
    ax.set_title("twin-injection amortization bias")
    fig.tight_layout()
    fig.savefig(outdir / "twin_grid.png", dpi=110)
    plt.close(fig)
    return "twin_grid.png"


def fig_anchors(outdir, data):
    """Sampler-anchor evidence (analysis/anchors.json): per-parameter
    median offset (in sampler sigma) and width ratio of NPE and
    IS-corrected NPE against the nested sampler, per anchor injection
    (reference: scripts/benchmark_real_events.py artifact family)."""
    plt = _mpl()
    anchors = data["anchors"]
    if not anchors:
        return None
    names = sorted(anchors)
    pnames = anchors[names[0]]["param_names"]
    fig, axes = plt.subplots(2, 1, figsize=(10, 7), sharex=True)
    x = list(range(len(pnames)))
    for i, nm in enumerate(names):
        a = anchors[nm]
        off = len(names) // 2
        for key_, color, lbl in (("comparison_npe_vs_sampler", C_BLUE,
                                  "NPE"),
                                 ("comparison_is_vs_sampler", C_RED,
                                  "IS-corrected")):
            comp = a[key_]
            # phase/geocent_time are absent when the sampler ran on the
            # marginalized likelihood — plot only the compared params
            pts = [(j, comp[p]) for j, p in enumerate(pnames) if p in comp]
            med = [c["median_offset_sigma"] for _, c in pts]
            wr = [c["width_ratio"] for _, c in pts]
            xs = [j + 0.08 * (i - off) for j, _ in pts]
            kw = dict(color=color, alpha=0.7, s=18)
            axes[0].scatter(xs, med, label=lbl if i == 0 else None, **kw)
            axes[1].scatter(xs, wr, label=lbl if i == 0 else None, **kw)
    axes[0].axhline(0, color=C_GREY, lw=1)
    axes[0].set_ylabel("median offset [sampler σ]")
    axes[0].legend()
    axes[1].axhline(1, color=C_GREY, lw=1)
    axes[1].set_ylabel("90% width ratio vs sampler")
    axes[1].set_xticks(x)
    axes[1].set_xticklabels(pnames, rotation=45, ha="right")
    fig.suptitle(f"NPE vs nested-sampler anchors ({len(names)} injections)")
    fig.tight_layout()
    fig.savefig(outdir / "anchors.png", dpi=110)
    plt.close(fig)
    return "anchors.png"


def fig_bench(outdir, benches):
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    # driver BENCH_r*.json wraps the bench line under "parsed"
    benches = {r: b.get("parsed", b) for r, b in benches.items()
               if "value" in b.get("parsed", b)}
    if not benches:
        return None
    rounds = sorted(benches)
    vals = [benches[r]["value"] for r in rounds]
    ax.semilogy(rounds, vals, "o-", color=C_BLUE)
    ax.axhline(1e6, color=C_RED, ls="--", lw=1, label="1e6 target")
    ax.axhline(1120, color=C_GREY, ls=":", lw=1, label="reference")
    ax.set_xlabel("round")
    ax.set_ylabel("posterior draws/s/chip")
    ax.legend()
    fig.tight_layout()
    fig.savefig(outdir / "bench_history.png", dpi=110)
    plt.close(fig)
    return "bench_history.png"


def fig_battery(outdir, report, tag):
    """Per-parameter 50/90 coverage + SBC KS p from a validate_checkpoint
    report (reports/val_*/report.json) — the gate evidence, visual."""
    plt = _mpl()
    m = report.get("metrics", {})
    cov50, cov90 = m.get("cov50_all"), m.get("cov90_all")
    sbc = m.get("sbc_ks_p")
    if not (cov50 and cov90 and sbc):
        return None
    names = list(cov90)
    x = range(len(names))
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    axes[0].plot(x, [cov50[n] for n in names], "o", color=C_BLUE,
                 label="cov50")
    axes[0].plot(x, [cov90[n] for n in names], "s", color=C_GREEN,
                 label="cov90")
    for y, d in ((0.5, 0.07), (0.9, 0.05)):
        axes[0].axhline(y, color=C_GREY, ls=":", lw=1)
        axes[0].axhspan(y - d, y + d, color=C_GREY, alpha=0.12)
    axes[0].set_ylabel("empirical coverage")
    axes[0].legend(ncol=2)
    axes[1].semilogy(x, [max(sbc[n], 1e-6) for n in names], "o",
                     color=C_BLUE)
    axes[1].axhline(1e-3, color=C_RED, ls="--", lw=1, label="gate 1e-3")
    axes[1].set_ylabel("SBC KS p")
    axes[1].set_xticks(list(x))
    axes[1].set_xticklabels(names, rotation=45, ha="right", fontsize=8)
    axes[1].legend()
    fig.suptitle(f"validation battery: {tag} "
                 f"({'PASS' if report.get('passed') else 'FAIL'})")
    fig.tight_layout()
    fig.savefig(outdir / f"battery_{tag}.png", dpi=110)
    plt.close(fig)
    return f"battery_{tag}.png"


def fig_evidence(outdir, data):
    """Prior-SMC logZ bias vs rejuvenation walk length against the
    analytic truth, with the matched-proposal IS point — the committed
    demonstration of the walk-length volume-bias mechanism
    (analysis/evidence_validation.json)."""
    plt = _mpl()
    syn = data.get("synthetic")
    if not syn:
        return None
    fig, ax = plt.subplots(figsize=(6, 4))
    rows = syn["prior_smc_vs_walk_length"]
    xs = [r["n_mcmc"] for r in rows]
    ys = [r["bias"] for r in rows]
    es = [r["logz_std"] for r in rows]
    ax.errorbar(xs, ys, yerr=es, fmt="o-", color=C_BLUE, capsize=3,
                label="prior-SMC bias ± σ")
    isg = syn["is_good_proposal"]
    ax.errorbar([max(xs) * 1.6], [isg["bias"]], yerr=[isg["logz_std"]],
                fmt="s", color=C_GREEN, capsize=3,
                label="matched-proposal IS")
    ax.axhline(0.0, color=C_GREY, ls=":", lw=1, label="analytic truth")
    ax.set_xscale("log")
    ax.set_xlabel("rejuvenation walk length (n_mcmc)")
    ax.set_ylabel("logZ bias (nats)")
    ax.set_title("evidence estimators vs analytic logZ "
                 f"({syn['truth_logz']:.2f})")
    ax.legend()
    fig.tight_layout()
    fig.savefig(outdir / "evidence_validation.png", dpi=110)
    plt.close(fig)
    return "evidence_validation.png"


def fig_anchor_convergence(outdir, data):
    """Nested-sampler logZ vs effort on the asym_q anchor outlier against
    the same-data flow-IS value (analysis/anchor_convergence.json):
    volume bias predicts logZ climbing toward IS as nlive/walks grow."""
    plt = _mpl()
    runs = data.get("runs")
    if not runs:
        return None
    fig, ax = plt.subplots(figsize=(6, 4))
    xs = [r["n_like_calls"] for r in runs]
    ys = [r["logz"] for r in runs]
    ax.plot(xs, ys, "o-", color=C_BLUE, label="fallback nested sampler")
    for r, x, y in zip(runs, xs, ys):
        ax.annotate(f"{r['nlive']}x{r['walks']}", (x, y), fontsize=7,
                    xytext=(4, -10), textcoords="offset points")
    is_b = data["is"]
    err = 1.0 / max(is_b["ess"], 1.0) ** 0.5
    ax.axhline(is_b["logz"], color=C_GREEN, ls="--", lw=1.2,
               label=f"flow-IS (eff {100 * is_b['efficiency']:.0f}%)")
    ax.axhspan(is_b["logz"] - err, is_b["logz"] + err, color=C_GREEN,
               alpha=0.15, lw=0)
    ax.set_xscale("log")
    ax.set_xlabel("likelihood calls (nlive x walks ladder)")
    ax.set_ylabel("logZ (vs noise)")
    ax.set_title("asym_q anchor: sampler logZ convergence toward flow-IS")
    ax.legend()
    fig.tight_layout()
    fig.savefig(outdir / "anchor_convergence.png", dpi=110)
    plt.close(fig)
    return "anchor_convergence.png"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outdir", default="figures")
    args = ap.parse_args(argv)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    made, skipped = [], []

    runs = {}
    for h in Path("model").glob("*/history.json"):
        try:
            runs[h.parent.name] = json.loads(h.read_text())
        except Exception:
            pass
    if runs:
        made.append(fig_training_curves(outdir, runs))
    else:
        skipped.append("training_curves (no model/*/history.json)")

    ob = Path("analysis/overlap_benchmark.json")
    if ob.exists():
        made.append(fig_overlap(outdir, json.loads(ob.read_text())))
    else:
        skipped.append("overlap_benchmark")

    tg = Path("analysis/twin_grid.json")
    if tg.exists():
        made.append(fig_twin_grid(outdir, json.loads(tg.read_text())))
    else:
        skipped.append("twin_grid")

    an = Path("analysis/anchors.json")
    if an.exists():
        p = fig_anchors(outdir, json.loads(an.read_text()))
        (made if p else skipped).append(p or "anchors (empty)")
    else:
        skipped.append("anchors")

    vals = sorted(Path("reports").glob("val_*/report.json"))
    if vals:
        latest = vals[-1]
        rep = json.loads(latest.read_text())
        p_ = fig_battery(outdir, rep, latest.parent.name)
        (made if p_ else skipped).append(p_ or "battery (no coverage)")
    else:
        skipped.append("battery")

    ac = Path("analysis/anchor_convergence.json")
    if ac.exists():
        p_ = fig_anchor_convergence(outdir, json.loads(ac.read_text()))
        (made if p_ else skipped).append(p_ or "anchor_convergence (empty)")
    else:
        skipped.append("anchor_convergence")

    ev = Path("analysis/evidence_validation.json")
    if ev.exists():
        p_ = fig_evidence(outdir, json.loads(ev.read_text()))
        (made if p_ else skipped).append(p_ or "evidence (no synthetic)")
    else:
        skipped.append("evidence_validation")

    benches = {}
    for b in Path(".").glob("BENCH_r*.json"):
        try:
            benches[b.stem] = json.loads(b.read_text())
        except Exception:
            pass
    if benches:
        made.append(fig_bench(outdir, benches))
    else:
        skipped.append("bench_history")

    print(f"made: {made}")
    if skipped:
        print(f"skipped (artifact missing): {skipped}")
    return made


if __name__ == "__main__":
    main()
