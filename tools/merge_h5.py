"""Concatenate two or more gw-gen HDF5 datasets into one file.

Usage: python tools/merge_h5.py OUT.h5 IN1.h5 IN2.h5 [...]

Streams per-sample rows (vlen datasets are ragged object arrays — reading
row-by-row in chunks keeps host RAM bounded on this 1-core box).  Scalar
datasets are concatenated; attrs are taken from the FIRST input, with
``merged_from`` recording provenance.  Inputs must share the sampling
contract (fs, f_lower) — asserted from attrs.
"""
import json
import sys

import h5py
import numpy as np

CHUNK = 2048


def main(out_path: str, in_paths: list) -> None:
    ins = [h5py.File(p, "r") for p in in_paths]
    keys = [k for k in ins[0].keys()
            if all(k in f.keys() for f in ins)]
    dropped = sorted(set().union(*[set(f.keys()) for f in ins])
                     - set(keys))
    if dropped:
        print(f"[merge] dropping keys not present in every input: {dropped}")
    for f in ins[1:]:
        for a in ("sampling_rate", "delta_t"):
            if a in ins[0].attrs and a in f.attrs:
                assert np.isclose(float(ins[0].attrs[a]), float(f.attrs[a])), (
                    f"attr {a} mismatch across inputs")
    n_total = sum(f["lengths"].shape[0] for f in ins)
    with h5py.File(out_path, "w") as out:
        for k in keys:
            src = ins[0][k]
            if src.dtype == object:
                row0 = src[0]
                if isinstance(row0, (bytes, str)):
                    dt = h5py.string_dtype()
                else:
                    dt = h5py.special_dtype(vlen=row0.dtype)
                d = out.create_dataset(k, shape=(n_total,), dtype=dt)
            else:
                d = out.create_dataset(k, shape=(n_total,), dtype=src.dtype)
            off = 0
            for f in ins:
                n = f[k].shape[0]
                for lo in range(0, n, CHUNK):
                    hi = min(lo + CHUNK, n)
                    d[off + lo:off + hi] = f[k][lo:hi]
                off += n
        for a, v in ins[0].attrs.items():
            out.attrs[a] = v
        out.attrs["merged_from"] = json.dumps(
            [{"path": p, "n": int(f["lengths"].shape[0])}
             for p, f in zip(in_paths, ins)])
    for f in ins:
        f.close()
    print(f"[merge] wrote {n_total} samples -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
