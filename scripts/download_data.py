#!/usr/bin/env python3
"""Download PixieVerse data/checkpoints from the HuggingFace dataset hub.

Mirrors the reference's scripts/download_data.py:1-151 (snapshot sync of
models/, render_outputs/, checkpoints_* etc. from the ``vlongle/pixie``
dataset, preserving directory structure) so reference-trained artifacts can
serve as golden fixtures (torch U-Net checkpoints -> train/convert_torch.py;
f3rm/nerfstudio field checkpoints -> recon/tcnn_compat.py).

Requires network access + huggingface_hub; exits with a clear message in
zero-egress environments.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def download_data(dataset_repo: str = "vlongle/pixie",
                  download_dirs: list[str] | None = None,
                  force_download: bool = False,
                  local_dir: str | None = None) -> Path | None:
    try:
        from huggingface_hub import list_repo_files, snapshot_download
    except ImportError:
        sys.exit("huggingface_hub is not installed; install it (network "
                 "environment required) to fetch reference artifacts.")

    download_path = Path(local_dir) if local_dir else Path(__file__).parent.parent
    download_path.mkdir(parents=True, exist_ok=True)
    print(f"Downloading from {dataset_repo} to {download_path}")

    repo_files = list_repo_files(repo_id=dataset_repo, repo_type="dataset")
    data_files = [f for f in repo_files
                  if f != "README.md" and not f.startswith(".")]
    available = sorted({f.split("/")[0] for f in data_files if "/" in f})
    print(f"Available directories: {available}")

    if download_dirs:
        missing = set(download_dirs) - set(available)
        if missing:
            print(f"WARNING: not in dataset: {sorted(missing)}")
        dirs = [d for d in download_dirs if d in available]
        allow_patterns = [p for d in dirs for p in (f"{d}/*", f"{d}/**/*")]
    else:
        dirs = available
        allow_patterns = None
    if not dirs:
        print("Nothing to download.")
        return None

    print(f"Downloading: {dirs}")
    out = snapshot_download(
        repo_id=dataset_repo,
        repo_type="dataset",
        local_dir=str(download_path),
        allow_patterns=allow_patterns,
        ignore_patterns=["README.md", ".gitattributes"],
        force_download=force_download,
    )
    print(f"Done: {out}")
    return Path(out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repo", default="vlongle/pixie")
    ap.add_argument("--dirs", nargs="*", default=None,
                    help="top-level dirs to fetch (default: all), e.g. "
                         "checkpoints_discrete render_outputs models")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--local-dir", default=None)
    args = ap.parse_args()
    download_data(args.repo, args.dirs, args.force, args.local_dir)


if __name__ == "__main__":
    main()
