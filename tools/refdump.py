"""Reader for the instrumented reference binary's dump stream.

Record format: 4-byte tag, 4-byte length, payload.  Tags per frame, in
emission order (see tools/instrument_reference.md):
  per (gr,ch):  PE__(f8), RATL(21 f8), RATS(36 f8), BLKT(i4)
  per (gr,ch):  SBS_(576 f8), XR__(576 f8)
  per (gr,ch):  GINF(16 i4), IX__(576 i4), SFL_(22 i4), SFS_(39 i4)
  per frame:    SCFS(8 i4), MDB_(1 i4)
"""
import numpy as np

GINF_FIELDS = [
    "part2_3_length", "big_values", "count1", "global_gain",
    "scalefac_compress", "window_switching_flag", "block_type",
    "table_select0", "table_select1", "table_select2", "region0_count",
    "region1_count", "preflag", "count1table_select", "part2_length",
    "quantizerStepSize",
]


def read_records(path):
    recs = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            tag = hdr[:4].decode()
            n = int.from_bytes(hdr[4:], "little")
            payload = f.read(n)
            if tag in ("PE__", "RATL", "RATS", "SBS_", "XR__", "QANF",
                       "CW__", "EB__", "ECB_", "CTB_", "THR_", "SNRL"):
                data = np.frombuffer(payload, "<f8")
            elif tag in ("ENGY", "PHI_"):
                data = np.frombuffer(payload, "<f4")
            else:
                data = np.frombuffer(payload, "<i4")
            recs.append((tag, data))
    return recs


def group_by_tag(recs):
    out = {}
    for tag, data in recs:
        out.setdefault(tag, []).append(data)
    return {k: np.array(v) for k, v in out.items()}


def load(path):
    """Returns dict tag -> (num_records, ...) arrays."""
    return group_by_tag(read_records(path))
