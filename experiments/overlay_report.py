"""Summarize the cross-framework overlay runs (VERDICT r4 #1/#2) into one
comparison JSON: torch-vs-JAX trajectory agreement, with the same-framework
different-noise arm as the run-to-run yardstick that defines "agreement".

Usage:
  python experiments/overlay_report.py --objective RR \
      --torch /root/corpora/overlay_RR_torch.json \
      --jax /root/corpora/overlay_RR_jax_tpu.json \
      --yardstick /root/corpora/overlay_RR_jax_tpu_s999.json \
      --out experiments/overlay_RR_results.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load(path):
    with open(path) as f:
        return json.load(f)


def probe_series(run, key):
    return ([p["step"] for p in run["probes"]],
            [p[key] for p in run["probes"]])


def loss_gap(a, b):
    """Median + p90 relative gap between two loss curves (same steps)."""
    la, lb = np.asarray(a["losses"]), np.asarray(b["losses"])
    n = min(len(la), len(lb))
    la, lb = la[:n], lb[:n]
    rel = np.abs(la - lb) / np.maximum(np.abs(la), 1e-12)
    return {"median_rel": float(np.median(rel)),
            "p90_rel": float(np.percentile(rel, 90)),
            "final_rel": float(rel[-1]), "steps": int(n)}


def smoothed_loss_gap(a, b, window=50):
    """Same, on window-averaged curves — the scale training curves are read
    at; removes per-step noise-ordering sensitivity."""
    la, lb = np.asarray(a["losses"]), np.asarray(b["losses"])
    window = max(1, min(window, min(len(la), len(lb))))  # short curves: one window
    n = (min(len(la), len(lb)) // window) * window
    la = la[:n].reshape(-1, window).mean(1)
    lb = lb[:n].reshape(-1, window).mean(1)
    rel = np.abs(la - lb) / np.maximum(np.abs(la), 1e-12)
    return {"median_rel": float(np.median(rel)),
            "p90_rel": float(np.percentile(rel, 90)),
            "final_rel": float(rel[-1]), "window": window}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--objective", required=True, choices=["RR", "DDM"])
    ap.add_argument("--torch", dest="torch_path", required=True)
    ap.add_argument("--jax", dest="jax_path", required=True)
    ap.add_argument("--yardstick", required=True,
                    help="same-framework arm with a different noise seed")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional runs to include (label=path)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    t, j, y = load(args.torch_path), load(args.jax_path), load(args.yardstick)
    out = {"objective": args.objective,
           "arms": {"torch": t["platform"], "jax": j["platform"],
                    "yardstick": f"{y['platform']} seed {y['noise_seed']}"},
           "protocol": j["protocol"], "steps": j["steps"]}

    # loss-curve agreement: cross-framework gap vs the run-to-run yardstick,
    # all pairs truncated to the COMMON horizon so the comparison windows
    # are identical even when one arm is shorter (partial torch runs)
    n0 = min(len(t["losses"]), len(j["losses"]), len(y["losses"]))
    cut = lambda r: {**r, "losses": r["losses"][:n0]}
    t_c, j_c, y_c = cut(t), cut(j), cut(y)
    out["loss_gap_torch_vs_jax"] = loss_gap(t_c, j_c)
    out["loss_gap_jax_vs_yardstick"] = loss_gap(j_c, y_c)
    out["loss_gap_torch_vs_jax_ep50"] = smoothed_loss_gap(t_c, j_c)
    out["loss_gap_jax_vs_yardstick_ep50"] = smoothed_loss_gap(j_c, y_c)

    # probe trajectories (norm/cos), tabulated at the shared cadence
    table = []
    steps_t = {p["step"]: p for p in t["probes"]}
    steps_j = {p["step"]: p for p in j["probes"]}
    steps_y = {p["step"]: p for p in y["probes"]}
    for s in sorted(set(steps_t) & set(steps_j)):
        row = {"step": s,
               "norm_torch": round(steps_t[s]["mean_norm"], 4),
               "norm_jax": round(steps_j[s]["mean_norm"], 4),
               "cos_torch": round(steps_t[s]["mean_pairwise_cos"], 4),
               "cos_jax": round(steps_j[s]["mean_pairwise_cos"], 4)}
        if s in steps_y:
            row["norm_yardstick"] = round(steps_y[s]["mean_norm"], 4)
            row["cos_yardstick"] = round(
                steps_y[s]["mean_pairwise_cos"], 4)
        table.append(row)
    out["probe_table"] = table

    def growth(run):
        s, n = probe_series(run, "mean_norm")
        n = np.asarray(n)
        # exponential rate fit on the last three quarters; a partial arm
        # (crash-safe writer) can hold a single probe — fit what exists
        lo = max(1, len(n) // 4) if len(n) > 2 else 0
        tail_s, tail_n = np.asarray(s[lo:]), n[lo:]
        if len(tail_n) < 2:
            return {"norm_first": float(n[0]), "norm_last": float(n[-1]),
                    "exp_rate_per_step": None, "plateau_norm": float(n[0]),
                    "jump_onset_step": None}
        rate = np.polyfit(tail_s, np.log(np.maximum(tail_n, 1e-12)), 1)[0]
        # drift onset: first probe where the norm leaves the plateau by 10x
        plateau = float(np.median(n[:max(2, len(n) // 10)]))
        onset = next((int(si) for si, ni in zip(s, n) if ni > 10 * plateau),
                     None)
        return {"norm_first": float(n[0]), "norm_last": float(n[-1]),
                "exp_rate_per_step": float(rate),
                "plateau_norm": plateau, "jump_onset_step": onset}

    out["norm_growth"] = {"torch": growth(t), "jax": growth(j),
                          "yardstick": growth(y)}
    for pair in args.extra:
        label, path = pair.split("=", 1)
        out.setdefault("extra_arms", {})[label] = growth(load(path))

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "probe_table"},
                     indent=1))
    print(f"wrote {args.out}")
    return out


if __name__ == "__main__":
    main()
