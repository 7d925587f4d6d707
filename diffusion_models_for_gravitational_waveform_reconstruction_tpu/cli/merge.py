"""``gw-merge``: concatenate gw-gen HDF5 datasets into one file.

No reference counterpart (the reference generates monolithic files,
``gen.py:420-827``); this exists because the TPU workflow composes
datasets — e.g. a uniform base set plus a region-enriched top-up targeting
the weakest mass cells — and ``gw-train --data`` takes a single file.

Streams row-by-row so host RAM stays bounded on ragged multi-GB inputs;
keys are intersected across inputs (Welch-PSD extras present in only some
files are dropped with a notice); attrs come from the first input plus a
``merged_from`` provenance record.
"""
import argparse
import json
import sys

import h5py
import numpy as np

CHUNK = 2048


def _n_rows(f: h5py.File) -> int:
    """Row count; 'lengths' is optional in the schema (StreamingDataset
    derives it from vlen rows), so fall back to the noisy dataset."""
    return int((f["lengths"] if "lengths" in f else f["noisy"]).shape[0])


def merge(out_path: str, in_paths: list) -> int:
    """Concatenate ``in_paths`` into ``out_path``; returns total rows."""
    import os
    for p in in_paths:
        if os.path.exists(out_path) and os.path.samefile(out_path, p):
            raise ValueError(
                f"--output-path {out_path!r} is also an input; opening it "
                f"for write would truncate the source dataset")
    ins = [h5py.File(p, "r") for p in in_paths]
    try:
        keys = [k for k in ins[0].keys()
                if all(k in f.keys() for f in ins)]
        dropped = sorted(set().union(*[set(f.keys()) for f in ins])
                         - set(keys))
        if dropped:
            print(f"[merge] dropping keys not present in every input: "
                  f"{dropped}", file=sys.stderr)
        for f in ins[1:]:
            for a in ("sampling_rate", "delta_t"):
                if a in ins[0].attrs and a in f.attrs:
                    if not np.isclose(float(ins[0].attrs[a]),
                                      float(f.attrs[a])):
                        raise ValueError(
                            f"attr {a!r} mismatch across inputs: "
                            f"{float(ins[0].attrs[a])} vs {float(f.attrs[a])}")
        # Generator-domain keys must agree for the merged corpus to be a
        # single training domain (the below-band turn-on taper and the
        # merger attachment change the waveform family; a model trained on
        # a silent mix sees inconsistent targets — measured A/B in
        # RESULTS.md "taper A/B").  Warn, don't error: deliberately mixed
        # corpora (augmentation studies) are legitimate.
        _domain_keys = ("approximant", "engine", "ringdown", "f_taper_frac",
                        "f_lower", "distance")
        cfgs = []
        for f in ins:
            try:
                cfgs.append(json.loads(f.attrs.get("config_args", "{}")))
            except (TypeError, ValueError):
                cfgs.append({})
        for k in _domain_keys:
            vals = [c.get(k) for c in cfgs]
            if any(v is not None and v != vals[0] for v in vals[1:]):
                print(f"[merge] WARNING: generator config {k!r} differs "
                      f"across inputs ({vals}); the merged corpus mixes "
                      f"waveform domains", file=sys.stderr)
        n_total = sum(_n_rows(f) for f in ins)
        with h5py.File(out_path, "w") as out:
            for k in keys:
                src = ins[0][k]
                if src.dtype == object:
                    row0 = src[0]
                    if isinstance(row0, (bytes, str)):
                        dt = h5py.string_dtype()
                    else:
                        dt = h5py.special_dtype(vlen=row0.dtype)
                else:
                    dt = src.dtype
                d = out.create_dataset(k, shape=(n_total,), dtype=dt)
                off = 0
                for f in ins:
                    n = f[k].shape[0]
                    for lo in range(0, n, CHUNK):
                        hi = min(lo + CHUNK, n)
                        chunk = f[k][lo:hi]
                        try:
                            d[off + lo:off + hi] = chunk
                        except TypeError:
                            # h5py collapses an object chunk whose rows all
                            # have EQUAL length into a 2-D array and then
                            # fails to broadcast it onto the vlen dataset
                            # (e.g. psd_welch: fixed nperseg -> every row
                            # 2049 bins).  Ragged chunks are unaffected, so
                            # fall back to per-row writes only here.
                            for i in range(hi - lo):
                                d[off + lo + i] = chunk[i]
                    off += n
            for a, v in ins[0].attrs.items():
                out.attrs[a] = v
            out.attrs["merged_from"] = json.dumps(
                [{"path": p, "n": _n_rows(f)}
                 for p, f in zip(in_paths, ins)])
        return n_total
    finally:
        for f in ins:
            f.close()


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        prog="gw-merge",
        description="Concatenate gw-gen HDF5 datasets (streamed, "
                    "bounded host RAM).")
    p.add_argument("--output-path", required=True)
    p.add_argument("inputs", nargs="+", help="input .h5 files, in order")
    args = p.parse_args(argv)
    if len(args.inputs) < 2:
        p.error("need at least two input files")
    n = merge(args.output_path, args.inputs)
    print(f"[merge] wrote {n} samples -> {args.output_path}")


if __name__ == "__main__":
    main()
