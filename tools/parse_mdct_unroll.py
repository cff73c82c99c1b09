#!/usr/bin/env python3
"""Extract the long-block MDCT term groupings from the reference.

The reference's block_type-0 MDCT (mdct.c:199-509) is hand-unrolled
with specific term groupings; floating-point results depend on that
exact association order.  This tool parses the C statements into a
data table [(m, [(coeff_terms, cos_sign, cos_k), ...])] so the oracle
can reproduce the sums bit-for-bit.  Output: mp3tpu/tables/data/
mdct_unroll.npz (ragged arrays flattened with offsets).
"""
import os
import re

import numpy as np

SRC = "/root/reference/src/mdct.c"
OUT = os.path.join(os.path.dirname(__file__), "..", "mp3tpu", "tables", "data")


def parse():
    with open(SRC) as f:
        src = f.read()
    # isolate the block_type-0 section
    start = src.index("/* block_type is 0.")
    end = src.index("out[17]=sum;") + len("out[17]=sum;")
    body = src[start:end]
    # join continuation lines
    body = body.replace("\\\n", " ")
    # statements: sum = (...) * [-]cos_l[m][k]; possibly several per out
    stmts = re.findall(
        r"sum\s*\+?=\s*\(([^)]*)\)\s*\*\s*(-?)\s*cos_l\[(\d+)\]\[(\d+)\]", body)
    outs = re.findall(r"out\[(\d+)\]\s*=\s*sum;", body)
    # walk statements in order, splitting per out by counting
    per_m = [[] for _ in range(18)]
    idx = 0
    pos = 0
    for m_str in range(18):
        pass
    # simpler: scan line by line
    per_m = {}
    cur = []
    for stmt in re.finditer(
            r"sum\s*(\+?=)\s*\(([^)]*)\)\s*\*\s*(-?)\s*cos_l\[(\d+)\]\[(\d+)\]\s*;|out\[(\d+)\]\s*=\s*sum;",
            body):
        if stmt.group(6) is not None:
            per_m[int(stmt.group(6))] = cur
            cur = []
        else:
            op, terms_s, neg, mm, kk = stmt.group(1, 2, 3, 4, 5)
            terms = []
            for t in re.finditer(r"([+-]?)\s*fin\[(\d+)\]", terms_s):
                sign = -1 if t.group(1) == "-" else 1
                terms.append((sign, int(t.group(2))))
            cos_sign = -1 if neg == "-" else 1
            cur.append((terms, cos_sign, int(kk)))
    assert len(per_m) == 18, sorted(per_m)
    return per_m


def main():
    per_m = parse()
    # flatten: for each m, statements; for each statement, terms
    stmt_m, stmt_cos_sign, stmt_cos_k, stmt_term_off = [], [], [], []
    term_sign, term_idx = [], []
    for m in range(18):
        for terms, cs, ck in per_m[m]:
            stmt_m.append(m)
            stmt_cos_sign.append(cs)
            stmt_cos_k.append(ck)
            stmt_term_off.append(len(term_sign))
            for s, i in terms:
                term_sign.append(s)
                term_idx.append(i)
    stmt_term_off.append(len(term_sign))
    np.savez(os.path.join(OUT, "mdct_unroll.npz"),
             stmt_m=np.array(stmt_m, np.int32),
             stmt_cos_sign=np.array(stmt_cos_sign, np.int32),
             stmt_cos_k=np.array(stmt_cos_k, np.int32),
             stmt_term_off=np.array(stmt_term_off, np.int32),
             term_sign=np.array(term_sign, np.int32),
             term_idx=np.array(term_idx, np.int32))
    print("statements:", len(stmt_m), "terms:", len(term_sign))
    for m in range(3):
        print(m, per_m[m][:3])


if __name__ == "__main__":
    main()
