"""Output writers: raw / txt / wig / bedgraph / bed / csv.

Byte-compatible with the reference writers (/root/reference/src/output.hpp):
  - floats are float32 reciprocals printed like C++ default operator<<
    (6 significant digits, general format == printf %g)
  - wig: variableStep run-length, 1-based, zero runs suppressed, span header
    only when the span changes between *emitted* runs (output.hpp:91-126)
  - bedgraph/bed: 0-based half-open runs, zero runs suppressed
  - csv: per-k-mer location lists, one column per fasta file per strand
"""

from __future__ import annotations

import numpy as np


def fmt_float(v: int) -> str:
    """1/v as the reference prints it: float32 value via C++ '<<' (== %g)."""
    f = float(np.float32(1.0) / np.float32(v)) if v != 0 else 0.0
    return f"{f:g}"


def _runs(values: np.ndarray):
    """Yield (value, start, length) runs of a 1-D array."""
    n = len(values)
    if n == 0:
        return
    change = np.nonzero(values[1:] != values[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    for s, e in zip(starts, ends):
        yield int(values[s]), int(s), int(e - s)


def save_raw(c: np.ndarray, path: str, mappability: bool, small: bool) -> None:
    if mappability:
        f = np.where(c != 0, np.float32(1.0) / np.maximum(c, 1).astype(np.float32), np.float32(0.0))
        f.astype("<f4").tofile(path)
    else:
        c.astype("<u1" if small else "<u2").tofile(path)


def _value_strings_lut(max_value: int, mappability: bool) -> tuple[np.ndarray, np.ndarray]:
    """Byte LUT of formatted values: frequency values are bounded by the cap,
    so every possible printed token (value + trailing space) is precomputed
    and whole chromosomes are rendered with numpy indexing instead of a
    per-position Python loop."""
    toks = [
        (fmt_float(v) if mappability else str(v)) + " " for v in range(max_value + 1)
    ]
    width = max(len(t) for t in toks)
    lut = np.zeros((max_value + 1, width), dtype=np.uint8)
    lens = np.zeros(max_value + 1, dtype=np.int32)
    for v, t in enumerate(toks):
        b = t.encode()
        lut[v, : len(b)] = np.frombuffer(b, np.uint8)
        lens[v] = len(b)
    return lut, lens


def _render_values(vals: np.ndarray, lut: np.ndarray, lens: np.ndarray) -> bytes:
    """Space-separated rendering of vals (no trailing space)."""
    if len(vals) == 0:
        return b""
    chars = lut[vals]  # [n, width]
    width = chars.shape[1]
    vlens = lens[vals].astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(vlens[:-1])))
    out = np.empty(int(vlens.sum()), dtype=np.uint8)
    for k in range(width):  # one vectorized scatter per token column
        m = vlens > k
        out[offsets[m] + k] = chars[m, k]
    return out.tobytes()[:-1]  # drop final trailing space


def save_txt(
    c: np.ndarray, path: str, chrom_names, chrom_lens, mappability: bool
) -> None:
    lut, lens = _value_strings_lut(int(c.max(initial=0)), mappability)
    with open(path, "wb") as out:
        pos = 0
        for name, ln in zip(chrom_names, chrom_lens):
            ln = int(ln)
            vals = c[pos : pos + ln]
            pos += ln
            out.write(f">{name}\n".encode())
            out.write(_render_values(np.asarray(vals), lut, lens))
            out.write(b"\n")


def save_wig(
    c: np.ndarray, path_prefix: str, chrom_names, chrom_lens, mappability: bool
) -> None:
    with open(path_prefix + ".wig", "w") as wig:
        pos = 0
        for name, ln in zip(chrom_names, chrom_lens):
            ln = int(ln)
            vals = c[pos : pos + ln]
            pos += ln
            last_occ = 0
            for v, start, occ in _runs(vals):
                if v == 0:
                    continue
                if last_occ != occ:
                    wig.write(f"variableStep chrom={name} span={occ}\n")
                sval = fmt_float(v) if mappability else str(v)
                wig.write(f"{start + 1} {sval}\n")
                last_occ = occ
    with open(path_prefix + ".chrom.sizes", "w") as cs:
        for name, ln in zip(chrom_names, chrom_lens):
            cs.write(f"{name}\t{int(ln)}\n")


def save_bedgraph(
    c: np.ndarray,
    path_prefix: str,
    chrom_names,
    chrom_lens,
    bedgraph_format: bool,
    mappability: bool,
) -> None:
    suffix = ".bedgraph" if bedgraph_format else ".bed"
    with open(path_prefix + suffix, "w") as out:
        pos = 0
        for name, ln in zip(chrom_names, chrom_lens):
            ln = int(ln)
            vals = c[pos : pos + ln]
            pos += ln
            for v, start, occ in _runs(vals):
                if v == 0:
                    continue
                name_col = "-\t" if not bedgraph_format else ""
                sval = fmt_float(v) if mappability else str(v)
                out.write(f"{name}\t{start}\t{start + occ}\t{name_col}{sval}\n")


def save_csv(
    path_prefix: str,
    locations: dict,
    rev_compl: bool,
    fasta_files: list[tuple[str, int]],  # (file name, last global seq index)
    csv_intervals: list[tuple[int, int, int]] | None,  # (chromId, begin, end) sorted
) -> None:
    """CSV location lists (output.hpp:189-288).

    `locations`: {(chrom_i1, pos_i2): ((f_i1, f_i2), (r_i1, r_i2))} where the
    key uses per-file chromosome ids and the value arrays use global sequence
    ids across all indexed files.
    """
    output_selection = csv_intervals is not None

    with open(path_prefix + ".csv", "w") as out:
        out.write('"k-mer"')
        for fname, _last in fasta_files:
            out.write(f';"+ strand {fname}"')
        if rev_compl:
            for fname, _last in fasta_files:
                out.write(f';"- strand {fname}"')
        out.write("\n")

        iv = 0
        ivs = csv_intervals or []

        def strand_cols(a1: np.ndarray, a2: np.ndarray) -> str:
            cols = []
            i = 0
            prev_chroms = 0
            for _fname, last in fasta_files:
                parts = []
                while i < len(a1) and a1[i] <= last:
                    parts.append(f"{int(a1[i]) - prev_chroms},{int(a2[i])}")
                    i += 1
                cols.append("|".join(parts))
                prev_chroms = last + 1
            return ";".join(cols)

        for (i1, i2) in sorted(locations):
            (f1, f2), (r1, r2) = locations[(i1, i2)]
            while iv < len(ivs) and (
                ivs[iv][0] < i1 or (ivs[iv][0] == i1 and ivs[iv][2] <= i2)
            ):
                iv += 1
            if output_selection and not (
                iv < len(ivs)
                and ivs[iv][0] == i1
                and ivs[iv][1] <= i2 < ivs[iv][2]
            ):
                continue
            out.write(f"{i1},{i2}")
            out.write(";" + strand_cols(f1, f2))
            if rev_compl:
                out.write(";" + strand_cols(r1, r2))
            out.write("\n")
