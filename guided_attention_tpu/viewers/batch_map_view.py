"""Offline viewer: grids of per-iteration attention-map PNGs.

CLI-compatible re-design of the reference viewer (reference
utils/batch_map_view.py:6-96): point it at a run's per-seed folder and it
grids every 16x16 token map by (iter, subiter), optionally annotating titles
with per-token losses parsed back out of the run's .txt log (the log schema
written by runtime/artifacts.py:
"{iter:02d}.{subiter:02d} loss for {word}: {value}").

Usage: python -m guided_attention_tpu.viewers.batch_map_view <folder> [token] [view_losses] [--save out.png]
"""
from __future__ import annotations

import os
import sys
from typing import Dict, Optional


def parse_losses_from_log(log_path: str, token: str) -> Dict[str, float]:
    losses: Dict[str, float] = {}
    if not os.path.exists(log_path):
        return losses
    with open(log_path) as f:
        for line in f.readlines():
            if f"loss for {token}" in line:
                key = line.split(" ")[0]
                losses[key] = float(line.split(":")[-1])
    return losses


def collect_maps(folder: str, only_token: Optional[str] = None):
    """Group 16x16 map PNGs by token; each entry (filename, image, iter, subiter)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups: Dict[str, list] = {}
    for fname in sorted(os.listdir(folder)):
        if not fname.endswith(".png"):
            continue
        img = plt.imread(os.path.join(folder, fname))
        if img.shape[0] != 16:
            continue
        parts = fname.split("_")
        if len(parts) < 3:
            continue
        token = parts[2]
        if only_token is not None and only_token != token:
            continue
        it = sub = None
        for i, p in enumerate(parts):
            if p == "iter" and i + 1 < len(parts):
                it = parts[i + 1]
            if p == "subiter" and i + 1 < len(parts):
                sub = parts[i + 1].replace(".png", "")
        groups.setdefault(token, []).append((fname, img, it, sub))
    return groups


def show_attn_plot(
    folder: str,
    only_token: Optional[str] = None,
    view_losses: bool = False,
    save_path: Optional[str] = None,
):
    import matplotlib

    if save_path:
        matplotlib.use("Agg")
    import matplotlib.gridspec as gridspec
    import matplotlib.pyplot as plt

    groups = collect_maps(folder, only_token)
    if not groups:
        print("no 16x16 maps found in", folder)
        return None
    losses = parse_losses_from_log(folder + ".txt", only_token) if view_losses else {}

    max_width = 20
    fig = plt.figure(figsize=(20, 5))
    plt.subplots_adjust(left=0.02, right=0.98, bottom=0.1, top=0.9, wspace=0.1, hspace=0.1)
    outer = gridspec.GridSpec(len(groups), 1, hspace=0.3)

    for gi, (token, maps) in enumerate(groups.items()):
        rows = len(maps) // max_width + 1
        inner = gridspec.GridSpecFromSubplotSpec(
            rows, max_width, subplot_spec=outer[gi], wspace=0.1, hspace=0.01
        )
        for k, (fname, img, it, sub) in enumerate(maps):
            ax = fig.add_subplot(inner[k])
            ax.set_xticks([])
            ax.set_yticks([])
            suffix = ""
            if losses and f"{it}.{sub}" in losses:
                suffix = f" l:{losses[f'{it}.{sub}']:.2f}"
            ax.set_title(token + suffix if k == 0 else f"{it}.{sub}{suffix}", fontsize=6)
            ax.imshow(img)

    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    else:
        plt.show()
    return fig


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    save = None
    if "--save" in sys.argv:
        save = sys.argv[sys.argv.index("--save") + 1]
    if not args:
        print("Requires Folder Name")
        raise SystemExit(-1)
    folder = args[0]
    token = args[1] if len(args) > 1 else None
    view_losses = bool(args[2]) if len(args) > 2 else False
    show_attn_plot(folder, token, view_losses, save)


if __name__ == "__main__":
    main()
