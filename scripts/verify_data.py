#!/usr/bin/env python
"""Verify (or explain how to fetch) the real MOSI/POM/IEMOCAP data blobs.

The reference repo does not vendor its large data files — `data/*.h5` must be
downloaded from the Google Drive folder linked at reference README.md:9
(https://drive.google.com/drive/folders/1JhCxsNgYB1brG6-e7mNJhMR8fmOCtq_6) or
rebuilt from the CMU-MultimodalSDK, and three sidecars are missing upstream
outright (reference .MISSING_LARGE_BLOBS: mosi/glove_300_mosi.npy,
pom/glove.pom.npy, pom/pom_train_ids.npy).  mmtpu therefore develops against
shape-faithful synthetic stand-ins (mmtpu/data/synthetic.py), and this script
is the explicit real-data gate: it checks a data directory against the exact
shape/dtype contract the loaders implement (reference utils.py:10-128), so a
real-data run is a deliberate, verified step rather than a silent fallback.

Usage:
    python scripts/verify_data.py [--data_dir DIR] [dataset ...]

Exit code 0 = every requested dataset verified real and well-formed;
1 = something missing/malformed (details printed per file).
"""

import argparse
import os
import sys

import numpy as np

# expected real-data geometry, from the reference's own loaders and shipped
# arrays (SURVEY.md §2 row 3; utils.py:20-90)
MOSI = {
    "vocab": (3016, 300),
    "seq_len": 20,
    "audio_dim": 74,
    "visual_dim": 47,
    "splits": {"train": 1284, "valid": 229, "test": 686},
}
POM = {
    "vocab_rows": 9206,
    "audio_dim": 43,
    "visual_dim": 43,
    "n_traits": 17,
    "ids": {"train": 600, "valid": 100, "test": 203},
}


def _check(ok_list, path, cond, detail=""):
    exists = os.path.exists(path)
    ok = exists and cond(path) if callable(cond) else exists
    status = "ok" if ok else ("BAD" if exists else "MISSING")
    print(f"  [{status:>7}] {path} {detail}")
    ok_list.append(ok)
    return ok


def _npy_shape(path):
    try:
        return np.load(path, mmap_mode="r", allow_pickle=False).shape
    except Exception:
        try:  # some sidecars are pickled object arrays upstream
            return np.load(path, mmap_mode=None, allow_pickle=True).shape
        except Exception:
            return None


def verify_mosi(root):
    print("MOSI (reference utils.py:20-50):")
    oks = []
    g = os.path.join(root, "mosi/glove_300_mosi.npy")
    _check(oks, g, lambda p: _npy_shape(p) == MOSI["vocab"],
           f"want {MOSI['vocab']}")
    _check(oks, os.path.join(root, "mosi/word2ix_300_mosi.pkl"), True)
    h5 = os.path.join(root, "data/mosi_data.h5")

    def h5_ok(p):
        import h5py

        with h5py.File(p, "r") as f:
            for split, n in MOSI["splits"].items():
                grp = f[split]
                if grp["text"].shape[:2] != (n, MOSI["seq_len"]):
                    return False
                if grp["covarep"].shape[2] != MOSI["audio_dim"]:
                    return False
                if grp["facet"].shape[2] != MOSI["visual_dim"]:
                    return False
        return True

    _check(oks, h5, h5_ok, "groups train/valid/test × facet/covarep/text/"
                           "lengths/label/id")
    ww = os.path.join(root, "word_weights.npy")
    freq = os.path.join(root, "enwiki_vocab_min200.txt")
    if not (os.path.exists(ww) or os.path.exists(freq)):
        print(f"  [MISSING] {ww} (or {freq} to compute it)")
        oks.append(False)
    else:
        print(f"  [     ok] word weights ({'cache' if os.path.exists(ww) else 'freq file'})")
    return all(oks)


def verify_pom(root):
    print("POM (reference utils.py:52-90):")
    oks = []
    _check(oks, os.path.join(root, "pom/glove.pom.npy"),
           lambda p: (_npy_shape(p) or (0, 0))[1] == 300, "want (*, 300)")
    _check(oks, os.path.join(root, "pom/glove_mappings.pom.json"), True)
    _check(oks, os.path.join(root, "data/pom_data.h5"), True)
    _check(oks, os.path.join(root, "pom/pom_word_weights.npy"), True)
    for split, n in POM["ids"].items():
        p = os.path.join(root, f"pom/pom_{split}_ids.npy")
        note = " (missing upstream too — .MISSING_LARGE_BLOBS)" \
            if split == "train" else ""
        _check(oks, p, lambda q: (_npy_shape(q) or (0,))[0] == n,
               f"want ({n}, *){note}")
    return all(oks)


def verify_iemocap(root, emotions=("happy", "sad", "angry", "neutral")):
    print("IEMOCAP (reference utils.py:92-128):")
    oks = []
    for emo in emotions:
        _check(oks, os.path.join(root, f"data/iemocap_{emo}.h5"), True)
    for side in ("glove.iemocap.npy", "iemocap_word_weights.npy"):
        _check(oks, os.path.join(root, f"iemocap/{side}"), True)
    return all(oks)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("datasets", nargs="*", default=["mosi", "pom"],
                    choices=["mosi", "pom", "iemocap"])
    ap.add_argument("--data_dir", default=".",
                    help="reference repo-root layout: <dir>/data/*.h5 + "
                         "<dir>/{mosi,pom,iemocap}/ sidecars")
    args = ap.parse_args(argv)

    results = {}
    for ds in args.datasets or ["mosi", "pom"]:
        fn = {"mosi": verify_mosi, "pom": verify_pom,
              "iemocap": verify_iemocap}[ds]
        results[ds] = fn(args.data_dir)

    if all(results.values()):
        print("all requested datasets verified — run with "
              f"--data_dir {args.data_dir} (loaders will use real data)")
        return 0
    print("\nreal blobs incomplete. To obtain them:")
    print("  1. download the processed data folder (reference README.md:9):")
    print("     https://drive.google.com/drive/folders/"
          "1JhCxsNgYB1brG6-e7mNJhMR8fmOCtq_6")
    print("  2. save the .h5 files under <data_dir>/data/ and the sidecar")
    print("     npy/json/pkl files under <data_dir>/{mosi,pom,iemocap}/")
    print("  3. re-run this script; until it passes, mmtpu loaders fall back")
    print("     to shape-faithful synthetic data (flagged in results) unless")
    print("     require_real=True.")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
