#!/usr/bin/env python3
"""Extract the reference's test vectors into JSON under tests/vectors/.

Pure data extraction (hex constants and Wycheproof blobs are published test
data, not code). Run once; outputs are committed so the repo is standalone.

- group.rs ADD/MUL vectors  -> group_<curve>.json
- field.rs DBL chains       -> field_dbl_<curve>.json
- wycheproof.blb (blobby)   -> wycheproof_<curve>.json  (wx, wy, msg, sig, ok)
"""

from __future__ import annotations

import json
import os
import re
import sys

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")

CURVES = {
    "secp256k1": "k256",
    "p192": "p192",
    "p224": "p224",
    "p256": "p256",
    "p384": "p384",
    "p521": "p521",
    "bign256": "bign256",
}


def parse_hex_tuples(text: str, arity: int):
    """Extract consecutive hex!("...") groups as tuples of `arity` hex strings."""
    hexes = re.findall(r'hex!\(\s*"([0-9a-fA-F]*)"\s*\)', text)
    assert len(hexes) % arity == 0, (len(hexes), arity)
    return [tuple(hexes[i: i + arity]) for i in range(0, len(hexes), arity)]


def extract_group(curve, crate):
    path = f"{REF}/{crate}/src/test_vectors/group.rs"
    if not os.path.exists(path):
        return
    text = open(path).read()
    add_m = re.search(r"ADD_TEST_VECTORS[^=]*=\s*&\[(.*?)\n\];", text, re.S)
    mul_m = re.search(r"MUL_TEST_VECTORS[^=]*=\s*&\[(.*?)\n\];", text, re.S)
    out = {}
    if add_m:
        out["add"] = [
            {"x": x, "y": y} for x, y in parse_hex_tuples(add_m.group(1), 2)
        ]
    if mul_m:
        out["mul"] = [
            {"k": k, "x": x, "y": y}
            for k, x, y in parse_hex_tuples(mul_m.group(1), 3)
        ]
    with open(f"{OUT}/group_{curve}.json", "w") as f:
        json.dump(out, f, indent=0)
    print(f"group_{curve}.json: {len(out.get('add', []))} add, "
          f"{len(out.get('mul', []))} mul")


def extract_field_dbl(curve, crate):
    path = f"{REF}/{crate}/src/test_vectors/field.rs"
    if not os.path.exists(path):
        return
    text = open(path).read()
    m = re.search(r"DBL_TEST_VECTORS[^=]*=\s*&?\[(.*?)\n\];", text, re.S)
    if not m:
        return
    vals = [h for (h,) in parse_hex_tuples(m.group(1), 1)]
    with open(f"{OUT}/field_dbl_{curve}.json", "w") as f:
        json.dump(vals, f, indent=0)
    print(f"field_dbl_{curve}.json: {len(vals)}")


def parse_blobby(data: bytes):
    """Parse a blobby de-duplicated blob file into a list of byte blobs."""
    pos = 0

    def vlq():
        # blobby uses the redundancy-free ("offset") VLQ: after the first byte,
        # v = ((v + 1) << 7) | (b & 0x7f)
        nonlocal pos
        b = data[pos]
        pos += 1
        v = b & 0x7F
        while b & 0x80:
            b = data[pos]
            pos += 1
            v = ((v + 1) << 7) | (b & 0x7F)
        return v

    n_dedup = vlq()
    dedup = []
    for _ in range(n_dedup):
        ln = vlq()
        dedup.append(data[pos: pos + ln])
        pos += ln
    blobs = []
    while pos < len(data):
        v = vlq()
        if v & 1:
            blobs.append(dedup[v >> 1])
        else:
            ln = v >> 1
            blobs.append(data[pos: pos + ln])
            pos += ln
    return blobs


def extract_wycheproof(curve, crate):
    path = f"{REF}/{crate}/src/test_vectors/data/wycheproof.blb"
    if not os.path.exists(path):
        return
    blobs = parse_blobby(open(path, "rb").read())
    assert len(blobs) % 5 == 0, len(blobs)
    out = []
    for i in range(0, len(blobs), 5):
        wx, wy, msg, sig, ok = blobs[i: i + 5]
        assert ok in (b"\x00", b"\x01"), ok
        out.append({
            "wx": wx.hex(), "wy": wy.hex(), "msg": msg.hex(),
            "sig": sig.hex(), "ok": ok == b"\x01",
        })
    with open(f"{OUT}/wycheproof_{curve}.json", "w") as f:
        json.dump(out, f, indent=0)
    npass = sum(v["ok"] for v in out)
    print(f"wycheproof_{curve}.json: {len(out)} cases ({npass} valid)")


def extract_ecdsa(curve, crate):
    """ECDSA_TEST_VECTORS TestVector structs (d, q_x, q_y, k, m, r, s) from
    <crate>/src/test_vectors/ecdsa.rs — RFC 6979 (k256) / FIPS 186-4 SigGen
    (p384, p521) published vectors; field order varies per crate, so parse
    named fields."""
    path = f"{REF}/{crate}/src/test_vectors/ecdsa.rs"
    if not os.path.exists(path):
        return
    text = open(path).read()
    m = re.search(r"ECDSA_TEST_VECTORS[^=]*=\s*&\[(.*)\n?\];", text, re.S)
    if not m:
        return
    out = []
    for block in re.findall(r"TestVector\s*\{(.*?)\}", m.group(1), re.S):
        fields = dict(re.findall(
            r'(\w+):\s*&hex!\(\s*"([0-9a-fA-F]*)"\s*\)', block))
        assert set(fields) == {"d", "q_x", "q_y", "k", "m", "r", "s"}, fields
        out.append(fields)
    with open(f"{OUT}/ecdsa_{curve}.json", "w") as f:
        json.dump(out, f, indent=0)
    print(f"ecdsa_{curve}.json: {len(out)} vectors")


def main():
    os.makedirs(OUT, exist_ok=True)
    for curve, crate in CURVES.items():
        extract_group(curve, crate)
        extract_field_dbl(curve, crate)
        extract_wycheproof(curve, crate)
        extract_ecdsa(curve, crate)


if __name__ == "__main__":
    sys.exit(main())
