"""Command-line interface: run / verify / plot optimizations from config
files.

The reference's entire config surface is the 27 kwargs of ``Grape()``
called from notebooks (SURVEY.md section 5: "Kwargs only ... No files, no
env vars, no argparse").  For production/batch usage qoc_tpu adds a thin
job-spec layer:

    python -m qoc_tpu run job.json            # optimize, write the h5 run
    python -m qoc_tpu verify RUN.h5 --atol 1e-4   # independent-oracle check
    python -m qoc_tpu plot RUN.h5 --out dash.png  # dashboard from a run

Config format: a JSON object whose keys are Grape() keyword arguments.
Matrices/vectors may be written as nested lists (real), as
``{"real": [...], "imag": [...]}`` (complex), or as
``{"npz": "file.npz", "key": "H0"}`` (loaded from an .npz archive).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _decode_array(obj, base_dir="."):
    """JSON value -> numpy array (real lists / {real,imag} / npz ref)."""
    import os

    if isinstance(obj, dict):
        if "npz" in obj:
            path = obj["npz"]
            if not os.path.isabs(path):
                path = os.path.join(base_dir, path)
            data = np.load(path)
            return np.asarray(data[obj["key"]])
        if "real" in obj:
            real = np.asarray(obj["real"], dtype=float)
            imag = np.asarray(obj.get("imag", np.zeros_like(real)),
                              dtype=float)
            return real + 1j * imag
        raise ValueError(f"unrecognized array spec: {list(obj)}")
    return np.asarray(obj)


ARRAY_KEYS = ("H0", "U", "U0", "initial_guess")
ARRAY_LIST_KEYS = ("Hops",)
MAYBE_VECTOR_LIST_KEYS = ("states_concerned_list",)


def load_config(path: str) -> dict:
    import os

    with open(path) as f:
        cfg = json.load(f)
    # keys starting with "_" are spec comments/metadata, not Grape kwargs
    cfg = {k: v for k, v in cfg.items() if not k.startswith("_")}
    base = os.path.dirname(os.path.abspath(path))
    # state-transfer targets/initial states are LISTS of vectors — decode
    # element-wise before the generic array pass touches them
    if cfg.get("state_transfer"):
        for k in ("U",) + MAYBE_VECTOR_LIST_KEYS:
            if k in cfg and isinstance(cfg[k], list):
                cfg[k] = [_decode_array(v, base) for v in cfg[k]]
    for k in ARRAY_KEYS:
        if k in cfg and cfg[k] is not None and not (
            cfg.get("state_transfer") and k == "U"
        ):
            cfg[k] = _decode_array(cfg[k], base)
    for k in ARRAY_LIST_KEYS:
        if k in cfg:
            cfg[k] = [_decode_array(h, base) for h in cfg[k]]
    if "dressed_info" in cfg and cfg["dressed_info"] is not None:
        di = cfg["dressed_info"]
        for k in ("eigenvectors", "eigenvalues"):
            if k in di:
                di[k] = _decode_array(di[k], base)
    return cfg


def cmd_run(args) -> int:
    from .grape import Grape

    cfg = load_config(args.config)
    cfg.setdefault("show_plots", False)
    if args.data_path:
        cfg["data_path"] = args.data_path
    if args.seed is not None:
        cfg["seed"] = args.seed
    if cfg.get("save", True):
        # friendlier than Grape's bare errors for spec-driven runs:
        # default the run name to the spec filename and the output
        # directory to the cwd
        cfg.setdefault("file_name",
                       os.path.splitext(os.path.basename(args.config))[0])
        cfg.setdefault("data_path", ".")
    res = Grape(**cfg)
    print(json.dumps({
        "loss": res.loss,
        "reg_loss": res.reg_loss,
        "iterations": res.iterations,
        "unitary_scale": res.unitary_scale,
        "file_path": res.file_path,
    }))
    return 0


def cmd_verify(args) -> int:
    from .utils.verification import verify_run

    out = verify_run(args.run_file, atol=args.atol, oracle=args.oracle)
    print(json.dumps(out))
    return 0 if all(out["all_close"]) else 1


def cmd_plot(args) -> int:
    """Render pulse + population panels straight from a saved run file."""
    import matplotlib

    matplotlib.use("Agg")
    import h5py
    import matplotlib.pyplot as plt

    with h5py.File(args.run_file, "r") as hf:
        uks = np.array(hf["uks"])[-1]
        total_time = float(np.array(hf["total_time"]))
        steps = int(np.array(hf["steps"]))
        error = np.array(hf["error"]) if "error" in hf else None
        pops = (
            np.array(hf["inter_vecs_mag_squared"])[-1]
            if "inter_vecs_mag_squared" in hf else None
        )
    dt = total_time / steps
    n_panels = 1 + (error is not None) + (pops is not None)
    fig, axes = plt.subplots(n_panels, 1, figsize=(12, 4 * n_panels))
    axes = np.atleast_1d(axes)
    i = 0
    if error is not None:
        axes[i].plot(error, "bx-")
        axes[i].set_yscale("log")
        axes[i].set_title("Fidelity error")
        i += 1
    ts = dt * np.arange(uks.shape[1])
    for k in range(uks.shape[0]):
        axes[i].plot(ts, uks[k], label=f"u{k}")
    axes[i].set_title("Optimized pulse")
    axes[i].legend()
    i += 1
    if pops is not None:
        for lvl in range(min(pops.shape[1], 5)):
            axes[i].plot(dt * np.arange(pops.shape[2]), pops[0, lvl],
                         label=f"level {lvl}")
        axes[i].set_title("Populations (first initial state)")
        axes[i].legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=100)
    print(args.out)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="qoc_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="optimize from a JSON job spec")
    p_run.add_argument("config")
    p_run.add_argument("--data-path", default=None)
    p_run.add_argument("--seed", type=int, default=None)
    p_run.set_defaults(fn=cmd_run)

    p_ver = sub.add_parser("verify", help="independent-oracle verification")
    p_ver.add_argument("run_file")
    p_ver.add_argument("--atol", type=float, default=1e-4)
    p_ver.add_argument("--oracle",
                       choices=["scipy", "ode", "qutip", "qutip-shim"],
                       default="scipy")
    p_ver.set_defaults(fn=cmd_verify)

    p_plot = sub.add_parser("plot", help="render dashboard from a run file")
    p_plot.add_argument("run_file")
    p_plot.add_argument("--out", default="dashboard.png")
    p_plot.set_defaults(fn=cmd_plot)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
