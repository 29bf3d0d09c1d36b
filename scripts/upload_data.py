#!/usr/bin/env python3
"""Upload result/checkpoint directories to a HuggingFace dataset repo.

Mirrors the reference's scripts/upload_data.py:1-224 (bulk upload_folder of
checkpoint/result directories, preserving structure, with junk-file
filtering).  Requires network access + huggingface_hub + a write token.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

DEFAULT_UPLOAD_DIRS = [
    "checkpoints_continuous_mse",
    "checkpoints_discrete",
    "real_scene_data",
    "real_scene_models",
]

IGNORE_PATTERNS = [
    "*.pyc", "__pycache__", ".DS_Store", "*.tmp", "*.log",
    "wandb", ".git", ".gitignore",
]


def upload_data(dataset_repo: str = "vlongle/pixie",
                upload_dirs: list[str] | None = None,
                token: str | None = None,
                base_path: str | None = None) -> None:
    try:
        from huggingface_hub import HfApi
    except ImportError:
        sys.exit("huggingface_hub is not installed; install it (network "
                 "environment required) to upload artifacts.")

    api = HfApi(token=token)
    root = Path(base_path) if base_path else Path(__file__).parent.parent
    dirs = upload_dirs if upload_dirs is not None else DEFAULT_UPLOAD_DIRS

    for name in dirs:
        local = root / name
        if not local.is_dir():
            print(f"skip {name}: {local} does not exist")
            continue
        files = [p for p in local.rglob("*") if p.is_file()]
        size_mb = sum(p.stat().st_size for p in files) / 1e6
        print(f"uploading {name}: {len(files)} files, {size_mb:.1f} MB")
        api.upload_folder(
            folder_path=str(local),
            path_in_repo=name,
            repo_id=dataset_repo,
            repo_type="dataset",
            ignore_patterns=IGNORE_PATTERNS,
        )
        print(f"done: {name}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repo", default="vlongle/pixie")
    ap.add_argument("--dirs", nargs="*", default=None)
    ap.add_argument("--token", default=None)
    ap.add_argument("--base-path", default=None)
    args = ap.parse_args()
    upload_data(args.repo, args.dirs, args.token, args.base_path)


if __name__ == "__main__":
    main()
