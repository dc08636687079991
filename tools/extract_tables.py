#!/usr/bin/env python3
"""Extract ETSI EN 302 755 standards constants from the reference C++ sources.

The reference implementation (/root/reference, gr-dvbt2ll) embeds the DVB-T2
standards tables (LDPC parity-address tables from Annex A, continual-pilot
group tables, PAPR reserved-carrier maps, P1 active-carrier list, S1/S2
modulation patterns, bit/cell interleaver permutation tables, ...) as C arrays.
These are pure standards data - every DVB-T2 implementation must contain the
identical numbers - so we machine-extract them into .npz files instead of
retyping thousands of integers by hand.

Only *data* is extracted here, never code.  The structural recipe for applying
continual-pilot tables per (FFT size, pilot pattern, carrier mode) is likewise
standards data (EN 302 755 tables 38-45) and is recovered by parsing the
highly regular switch structure of init_pilots().

Outputs:
  dvbt2ll_tpu/tables/data/standards.npz   - all integer tables
  dvbt2ll_tpu/tables/data/cp_recipe.json  - continual-pilot application recipe
"""
import json
import os
import re
import sys

import numpy as np

REF = "/root/reference/lib"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "dvbt2ll_tpu", "tables", "data")

ARRAY_RE = re.compile(
    r"const\s+(?:unsigned\s+char|int)\s+\w+::(\w+)\s*\[[^=]*\]\s*=\s*\{(.*?)\};",
    re.DOTALL,
)


def parse_arrays(path):
    """Parse all `const int Class::name[..] = {...};` arrays in a C++ file."""
    with open(path) as f:
        text = f.read()
    tables = {}
    for m in ARRAY_RE.finditer(text):
        name, body = m.group(1), m.group(2)
        # 2-D tables keep row structure via inner braces.
        rows = re.findall(r"\{([^{}]*)\}", body)
        if rows:
            data = [
                [int(tok, 0) for tok in re.findall(r"0[xX][0-9a-fA-F]+|\d+", r)]
                for r in rows
            ]
            # some C tables have ragged rows; zero-pad (col 0 holds the count)
            width = max(len(r) for r in data)
            arr = np.zeros((len(data), width), dtype=np.int64)
            for i, r in enumerate(data):
                arr[i, : len(r)] = r
            tables[name] = arr
        else:
            toks = re.findall(r"0[xX][0-9a-fA-F]+|\d+", body)
            tables[name] = np.array([int(t, 0) for t in toks], dtype=np.int64)
    return tables


def parse_cp_recipe(path):
    """Recover the continual-pilot application recipe from init_pilots().

    Returns a list of dicts:
      {fft: "1K", pattern: "PP1", table: "pp1_cp1", count: 20,
       mod: 1632 | 0, extended_only: bool}
    """
    with open(path) as f:
        lines = f.readlines()
    # Slice out init_pilots body.
    start = next(i for i, l in enumerate(lines) if "::init_pilots" in l)
    end = next(i for i, l in enumerate(lines) if "::general_work" in l and i > start)
    body = lines[start:end]

    fft_re = re.compile(r"case FFTSIZE_(\w+):")
    pp_re = re.compile(r"case PILOT_(PP\d):")
    for_re = re.compile(r"for \(int i = 0; i < (\d+); i\+\+\)")
    map_re = re.compile(r"data_carrier_map\[(pp\w+)\[i\](?: % (\d+))?\]")
    ext_re = re.compile(r"carrier_mode == CARRIERS_EXTENDED")

    recipe = []
    ffts, pattern, count, extended = [], None, None, False
    depth_at_ext = None
    depth = 0
    seen_scatter_loop = False
    for line in body:
        # The first `for (i < C_PS)` loop after the switch ends the CP section.
        if "remainder = (i - K_EXT)" in line:
            break
        depth += line.count("{") - line.count("}")
        if depth_at_ext is not None and depth < depth_at_ext:
            extended = False
            depth_at_ext = None
        m = fft_re.search(line)
        if m:
            # collect fall-through case labels (8K / 8K_T2GI share one body)
            if pattern is None and ffts and recipe and recipe[-1]["fft"] in ffts:
                pass
            if seen_scatter_loop or pattern is not None:
                ffts = []
                pattern = None
            seen_scatter_loop = False
            ffts.append(m.group(1))
            continue
        m = pp_re.search(line)
        if m:
            pattern = m.group(1)
            extended = False
            depth_at_ext = None
            continue
        m = ext_re.search(line)
        if m:
            extended = True
            depth_at_ext = depth
            continue
        m = for_re.search(line)
        if m:
            count = int(m.group(1))
            continue
        m = map_re.search(line)
        if m and pattern is not None:
            table, mod = m.group(1), int(m.group(2) or 0)
            for fft in ffts:
                entry = {
                    "fft": fft,
                    "pattern": pattern,
                    "table": table,
                    "count": count,
                    "mod": mod,
                    "extended_only": extended,
                }
                if entry not in recipe:
                    recipe.append(entry)
            continue

    # drop the duplicated _T2GI variants: identical to their base size
    recipe = [r for r in recipe if not r["fft"].endswith("T2GI")]
    return recipe


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    tables = {}
    for fname in (
        "bbheaderbch_bb_impl.cc",
        "interleavermod_bc_impl.cc",
        "framemapperfint_cc_impl.cc",
        "pilotgenp1insert_cc_impl.cc",
    ):
        t = parse_arrays(os.path.join(REF, fname))
        for k, v in t.items():
            if k in tables:
                # L1 mux16/mux64 in framemapper differ from data-path mux16/64.
                k = k + "_l1" if fname.startswith("framemapper") else k + "_2"
            tables[k] = v

    # --- sanity checks ------------------------------------------------------
    ldpc_expect = {
        "ldpc_tab_1_2N": 90, "ldpc_tab_3_5N": 108, "ldpc_tab_2_3N_DVBT2": 120,
        "ldpc_tab_3_4N": 135, "ldpc_tab_4_5N": 144, "ldpc_tab_5_6N": 150,
        "ldpc_tab_1_3S": 15, "ldpc_tab_2_5S": 18, "ldpc_tab_1_2S": 20,
        "ldpc_tab_3_5S_DVBT2": 27, "ldpc_tab_2_3S": 30, "ldpc_tab_3_4S": 33,
        "ldpc_tab_4_5S": 35, "ldpc_tab_5_6S": 37, "ldpc_tab_1_4S": 9,
    }
    for name, rows in ldpc_expect.items():
        assert name in tables, f"missing {name}"
        assert tables[name].shape[0] == rows, (name, tables[name].shape)
        # column 0 is the per-row address count
        assert (tables[name][:, 0] <= tables[name].shape[1] - 1).all(), name
    assert tables["p1_active_carriers"].size == 384
    assert tables["pn_sequence_table"].size == 2624 // 8
    assert tables["s1_modulation_patterns"].shape == (8, 8)
    assert tables["s2_modulation_patterns"].shape == (16, 32)
    for n, sz in [("1k", 10), ("2k", 18), ("4k", 36), ("8k", 72),
                  ("16k", 144), ("32k", 288)]:
        assert tables[f"p2_papr_map_{n}"].size == sz
        assert tables[f"tr_papr_map_{n}"].size == sz

    np.savez_compressed(os.path.join(OUT_DIR, "standards.npz"), **tables)

    recipe = parse_cp_recipe(os.path.join(REF, "pilotgenp1insert_cc_impl.cc"))
    with open(os.path.join(OUT_DIR, "cp_recipe.json"), "w") as f:
        json.dump(recipe, f, indent=1)

    print(f"extracted {len(tables)} tables, {len(recipe)} CP recipe entries")
    for k in sorted(tables):
        print(f"  {k}: {tables[k].shape}")


if __name__ == "__main__":
    sys.exit(main())
