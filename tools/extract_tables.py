#!/usr/bin/env python3
"""Package the ISO/MPEG constant tables into the repo as .npz files.

The tables themselves are normative data from ISO 11172-3 / ISO 13818-3
(Huffman code tables B.7, psychoacoustic model 2 partition data, the
512-tap analysis window of Table C.1, absolute thresholds, and the
Layer II bit-allocation tables).  They are extracted numerically from a
compiled dump of the reference encoder's table translation unit
(``/root/reference/src/tables.c``, ``huffman.c``) by ``/tmp/dump/dumper.c``
so that no hand transcription errors can creep in.

Run once per container:  python tools/extract_tables.py
The resulting ``mp3tpu/tables/data/*.npz`` files are committed, so the
repo is self-contained afterwards.
"""
import os
import numpy as np

DUMP = "/tmp/dump"
OUT = os.path.join(os.path.dirname(__file__), "..", "mp3tpu", "tables", "data")


def load_manifest():
    arrays = {}
    with open(os.path.join(DUMP, "manifest.txt")) as f:
        for line in f:
            name, ty, n = line.split()
            arrays[name] = np.fromfile(
                os.path.join(DUMP, f"{name}.bin"), dtype=np.dtype(ty), count=int(n)
            )
    return arrays


def load_huffman():
    """Parse the huffman dump into dense arrays.

    Layout mirrors ISO 11172-3 Table B.7 (cf. reference huffman.c:82-118):
    34 tables; tables 0..31 are (xlen*ylen) pair tables (dense 16x16 padded),
    32/33 are the count1 quad tables (16 entries).
    Produces:
      codes[34][16][16] uint32, hlen[34][16][16] uint8,
      xlen[34], ylen[34], linbits[34], linmax[34] int32.
    """
    codes = np.zeros((34, 16, 16), dtype=np.uint32)
    hlen = np.zeros((34, 16, 16), dtype=np.uint8)
    meta = np.zeros((34, 4), dtype=np.int32)  # xlen ylen linbits linmax
    with open(os.path.join(DUMP, "huffman.txt")) as f:
        lines = f.read().split("\n")
    i = 0
    while i < len(lines):
        line = lines[i]
        if not line.startswith("table"):
            i += 1
            continue
        parts = line.split()
        t = int(parts[1])
        xlen, ylen, linbits, linmax, n = (
            int(parts[3]), int(parts[5]), int(parts[7]), int(parts[9]), int(parts[11]),
        )
        meta[t] = (xlen, ylen, linbits, linmax)
        for j in range(n):
            i += 1
            c, l = lines[i].split()
            if t >= 32:
                codes[t, 0, j] = int(c)
                hlen[t, 0, j] = int(l)
            else:
                codes[t, j // ylen, j % ylen] = int(c)
                hlen[t, j // ylen, j % ylen] = int(l)
        i += 1
    return codes, hlen, meta


def main():
    os.makedirs(OUT, exist_ok=True)
    arrays = load_manifest()
    np.savez(
        os.path.join(OUT, "iso_tables.npz"),
        absthr_0=arrays["absthr_0"],
        absthr_1=arrays["absthr_1"],
        absthr_2=arrays["absthr_2"],
        psy_data=arrays["psy_data"],
        enwindow=arrays["enwindow"],
        alloc_0=arrays["alloc_0"],
        alloc_1=arrays["alloc_1"],
        alloc_2=arrays["alloc_2"],
        alloc_3=arrays["alloc_3"],
        alloc_4=arrays["alloc_4"],
    )
    codes, hlen, meta = load_huffman()
    np.savez(
        os.path.join(OUT, "huffman.npz"), codes=codes, hlen=hlen, meta=meta
    )
    print("wrote", os.listdir(OUT))


if __name__ == "__main__":
    main()
