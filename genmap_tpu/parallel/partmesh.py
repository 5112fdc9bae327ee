"""Part x data sharded execution: index parts across one mesh axis, k-mer
blocks across the other, per-part results merged on-device over ICI.

This is the hg38-and-beyond scale-out story (SURVEY §2.10): a genome whose
both-strand symbol count exceeds uint32 splits into sub-index parts
(index/fmindex.py); on a mesh with axes ('part', 'data') each device group
holds ONE part's rank rows (no replication of the big tables across the part
axis) and a slice of the batch.  Every device searches its local part for its
local blocks; the exact per-part counts are summed with `psum` over the part
axis — riding ICI, never the host.  The reference has no counterpart
(single-node OpenMP); this replaces its shared-memory frequency vector.

Feature parity with the single-part path (VERDICT r4 task 3): the stacked
upload carries each part's SEED tables, DIMER rows, and (unless light) the
sampled-SA + indicator fibres, so the same performance machinery runs under
the mesh —
  * the unique-infix probe: per-plan masses psum over 'part', the skip
    decision and bit-packing stay on device (make_part_prober);
  * occupancy calibration: per-step candidate counts pmax over 'part' (the
    shared program's pools must cover the widest part) via with_occ;
  * per-part exact intervals / CSV states: all_gather over 'part' exposes
    the per-part axes the dedup interval keys and the CSV location lists
    need (with_exact_parts / with_states);
  * locate: LF-walks run on each part's own device group against its local
    sampled SA (make_part_locator) — no replicated fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genmap_tpu.ops.rank import DeviceIndex, locate, seed_depth
from genmap_tpu.search.engine import (
    Tier,
    block_mapper_impl,
    exact_prefix_steps,
    probe_thresholds,
)
from genmap_tpu.search.schemes import plans_for

_U32 = jnp.uint32


def part_data_mesh(n_parts: int, n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    assert len(devices) % n_parts == 0, (
        f"{len(devices)} devices not divisible by {n_parts} parts"
    )
    arr = np.array(devices).reshape(n_parts, -1)
    return Mesh(arr, ("part", "data"))


def _pad_stack(arrs, dtype=np.uint32):
    """Stack per-part arrays padded to the max shape (leading dims only)."""
    shape = tuple(max(a.shape[d] for a in arrs) for d in range(arrs[0].ndim))
    out = np.zeros((len(arrs),) + shape, dtype)
    for i, a in enumerate(arrs):
        out[i][tuple(slice(0, s) for s in a.shape)] = a
    return out


def stack_parts(data, mesh: Mesh, light: bool = True) -> dict:
    """Pad parts to uniform shapes and device_put sharded over 'part'.

    `light=False` additionally ships the sampled-SA values and indicator
    rank rows (several GB at hg38 scale) — needed only by locate
    (CSV / exclude-pseudo runs)."""
    parts = data.parts
    n_parts = len(parts)
    assert mesh.shape["part"] == n_parts, (
        f"mesh part axis {mesh.shape['part']} != {n_parts} index parts"
    )
    from genmap_tpu.index.fmindex import D_WIDTH, wide_rows

    blocks = _pad_stack([wide_rows(np.asarray(p.fwd.blocks)) for p in parts])
    C = np.stack([p.C.astype(np.uint32) for p in parts])
    strand = _pad_stack([np.asarray(p.strand_blocks) for p in parts])
    n_tot = np.array([p.n_total for p in parts], np.uint32)

    has_dimer = all(p.dimer is not None for p in parts)
    if has_dimer:
        dimer = _pad_stack([wide_rows(np.asarray(p.dimer)) for p in parts])
        C2 = np.stack([np.asarray(p.C2, np.uint32) for p in parts])
    else:
        dimer = np.zeros((n_parts, 1, 2 * D_WIDTH), np.uint32)
        C2 = np.zeros((n_parts, 16), np.uint32)

    # seed tables: one shared depth (the program is one SPMD body), each
    # part's table built on device from its own rank rows and fetched back
    t0 = min(seed_depth(int(p.n_total)) for p in parts)
    seed_mlo_l, seed_size_l = [], []
    for p in parts:
        ix = DeviceIndex.from_part(data, p, light=True)
        seed_mlo_l.append(np.asarray(ix.seed_mlo[: _seed_len(t0)]))
        seed_size_l.append(np.asarray(ix.seed_size[: _seed_len(t0)]))
        del ix
    seed_mlo = np.stack(seed_mlo_l)
    seed_size = np.stack(seed_size_l)

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    out = dict(
        blocks=put(blocks, P("part")),
        C=put(C, P("part")),
        strand=put(strand, P("part")),
        n_tot=put(n_tot, P("part")),
        dimer=put(dimer, P("part")),
        C2=put(C2, P("part")),
        seed_mlo=put(seed_mlo, P("part")),
        seed_size=put(seed_size, P("part")),
        has_n=data.has_n,
        has_dimer=has_dimer,
        dimer_flag_frac=max(p.dimer_flag_frac for p in parts),
        seed_t0=t0,
        sampling=data.sampling,
        n_max=max(p.n_total for p in parts),
        n_parts=n_parts,
        light=light,
    )
    if not light:
        out["sa_i1"] = put(_pad_stack([np.asarray(p.sa_i1) for p in parts]),
                           P("part"))
        out["sa_i2"] = put(_pad_stack([np.asarray(p.sa_i2) for p in parts]),
                           P("part"))
        out["ind"] = put(_pad_stack([np.asarray(p.ind_blocks) for p in parts]),
                         P("part"))
    return out


def _seed_len(t0: int) -> int:
    return (4 ** (t0 + 1) - 1) // 3


def _local_index(stacked, blocks, C, strand, dimer, C2, seed_mlo, seed_size,
                 sa_i1=None, sa_i2=None, ind=None) -> DeviceIndex:
    """DeviceIndex over one part's local slices (leading part axis length 1)."""
    return DeviceIndex(
        fwd_blocks=blocks[0],
        C=C[0],
        sa_i1=sa_i1[0] if sa_i1 is not None else jnp.zeros((1,), _U32),
        sa_i2=sa_i2[0] if sa_i2 is not None else jnp.zeros((1,), _U32),
        strand_blocks=strand[0],
        ind_blocks=ind[0] if ind is not None else jnp.zeros((1, 5), _U32),
        seed_mlo=seed_mlo[0],
        seed_size=seed_size[0],
        dimer_blocks=dimer[0],
        C2=C2[0],
        has_n=stacked["has_n"],
        sampling=stacked["sampling"],
        n_total=0,  # unused on this path: the traced n_tot[0] is passed
        seed_t0=stacked["seed_t0"],
    )


def make_part_mapper(
    stacked: dict,
    dtext,
    mesh: Mesh,
    *,
    K: int,
    errors: int,
    overlap: int,
    J: int,
    B: int,
    tier: Tier,
    cap: int,
    rev_compl: bool,
    pools=None,
    with_occ: bool = False,
    with_exact_parts: bool = False,
    with_states: bool = False,
):
    """Part x data sharded block mapper.

    Scalar results (hits, exact sizes, overflow) merge with psum over
    'part'; calibration signals (occ, surv) merge with pmax (the shared
    program's capacities must cover the widest part); per-part axes needed
    host-side (dedup interval keys, CSV states) ride an all_gather over
    'part' when requested.  `with_states` implies the per-part exact
    outputs too (the CSV location lists consume both)."""
    with_exact_parts = with_exact_parts or with_states
    o = overlap
    assert o == K - J + 1
    plans = plans_for(errors, o)
    infix_off = K - o
    if tier.dimer:
        assert stacked["has_dimer"], "dimer tier on a part without dimer rows"
    # conservative: the widest part needs the most exact prefix steps; n_tot
    # is traced inside the shard_map, so the step split is host-static
    ex_steps = exact_prefix_steps(stacked["n_max"], 16 if tier.dimer else 64)
    Ln = K + J - 1

    def body(blocks, C, strand, n_tot, dimer, C2, seed_mlo, seed_size,
             dtext, starts, cnt, limit):
        from genmap_tpu.ops.rank import extract_needles

        needles = extract_needles(dtext, starts, Ln, limit)
        index = _local_index(stacked, blocks, C, strand, dimer, C2,
                             seed_mlo, seed_size)
        out = block_mapper_impl(
            index, needles, cnt, n_tot[0], plans=plans, infix_off=infix_off,
            J=J, K=K, tier=tier, errors=errors, cap=cap, rev_compl=rev_compl,
            with_states=with_states, exact_steps=ex_steps,
            n_static=stacked["n_max"], with_exact=True, pools=pools,
            with_occ=with_occ,
        )
        # exact cross-part merge over ICI: counts add (parts partition the
        # sequence set; matches never cross sentinels).  hits are uint16 on
        # the wire; widen before the sum so per-part caps cannot wrap.
        res = dict(
            hits=jnp.minimum(
                jax.lax.psum(out["hits"].astype(_U32), "part"), _U32(cap)
            ),
            exact_size=jax.lax.psum(out["exact_size"], "part"),
            exact_size_total=jax.lax.psum(out["exact_size_total"], "part"),
            overflow=jax.lax.psum(out["overflow"].astype(jnp.int32), "part") > 0,
            overflow_cap=jax.lax.psum(
                out["overflow_cap"].astype(jnp.int32), "part"
            ) > 0,
        )
        if with_occ:
            # the shared pool schedule must hold the WIDEST part's frontier
            res["occ"] = jax.lax.pmax(out["occ"], "part")
            res["surv"] = jax.lax.pmax(out["surv"], "part")
        if with_exact_parts:
            res["exact_flo_parts"] = jax.lax.all_gather(out["exact_flo"], "part")
            res["exact_size_total_parts"] = jax.lax.all_gather(
                out["exact_size_total"], "part"
            )
        if with_states:
            res["states_parts"] = tuple(
                jax.lax.all_gather(a, "part") for a in out["states"]
            )
        return res

    pp = (P("part"),) * 8
    out_specs_tpl = dict(
        hits=P("data"), exact_size=P("data"), exact_size_total=P("data"),
        overflow=P("data"), overflow_cap=P("data"),
    )
    if with_occ:
        out_specs_tpl["occ"] = P("data")
        out_specs_tpl["surv"] = P("data")
    if with_exact_parts:
        out_specs_tpl["exact_flo_parts"] = P(None, "data")
        out_specs_tpl["exact_size_total_parts"] = P(None, "data")
    if with_states:
        out_specs_tpl["states_parts"] = (P(None, "data"),) * 4

    sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=pp + (P(), P("data"), P("data"), P()),
        out_specs=out_specs_tpl,
        check_vma=False,
    )
    run_jit = jax.jit(sm)

    def run(starts, cnt, limit):
        return run_jit(
            stacked["blocks"], stacked["C"], stacked["strand"],
            stacked["n_tot"], stacked["dimer"], stacked["C2"],
            stacked["seed_mlo"], stacked["seed_size"], dtext, starts, cnt,
            limit,
        )

    return run


def make_part_prober(
    stacked: dict,
    dtext,
    mesh: Mesh,
    *,
    K: int,
    errors: int,
    overlap: int,
    J: int,
    B: int,
    tier: Tier,
    cap: int,
    rev_compl: bool,
    probe_cut=None,
):
    """Unique-infix probe under the part x data mesh.

    Each part scans its local blocks; per-plan survivor masses psum over
    'part' (the soundness argument survives the sum: the self-match lives in
    exactly one part, any other part's surviving row is a genuine second
    occurrence — engine.py block_mapper_impl docstring), and the skip
    decision + bit packing stay ON DEVICE like the single-part "bits" mode."""
    o = overlap
    plans = plans_for(errors, o)
    infix_off = K - o
    if tier.dimer:
        assert stacked["has_dimer"]
    ex_steps = exact_prefix_steps(stacked["n_max"], 16 if tier.dimer else 64)
    Ln = K + J - 1
    thr_np = probe_thresholds(plans, infix_off, probe_cut)

    def body(blocks, C, strand, n_tot, dimer, C2, seed_mlo, seed_size,
             dtext, starts, cnt, limit):
        from genmap_tpu.ops.rank import extract_needles

        needles = extract_needles(dtext, starts, Ln, limit)
        index = _local_index(stacked, blocks, C, strand, dimer, C2,
                             seed_mlo, seed_size)
        out = block_mapper_impl(
            index, needles, cnt, n_tot[0], plans=plans, infix_off=infix_off,
            J=J, K=K, tier=tier, errors=errors, cap=cap, rev_compl=rev_compl,
            with_states=False, exact_steps=ex_steps,
            n_static=stacked["n_max"], probe_only=True, probe_cut=probe_cut,
        )
        mass = jax.lax.psum(out["mass_p"], "part")
        ovf = jax.lax.psum(out["overflow"].astype(jnp.int32), "part") > 0
        nwin = out["nwin"]  # needle property: identical on every part
        thr = jnp.asarray(thr_np, _U32)
        skip = (mass <= thr).all(axis=-1) & ~ovf & ~nwin
        sb = skip.reshape(-1, 32).astype(_U32)
        bits = (sb << jnp.arange(32, dtype=_U32)).sum(axis=-1, dtype=_U32)
        return dict(skip_bits=bits)

    sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("part"),) * 8 + (P(), P("data"), P("data"), P()),
        out_specs=dict(skip_bits=P("data")),
        check_vma=False,
    )
    run_jit = jax.jit(sm)

    def run(starts, cnt, limit):
        return run_jit(
            stacked["blocks"], stacked["C"], stacked["strand"],
            stacked["n_tot"], stacked["dimer"], stacked["C2"],
            stacked["seed_mlo"], stacked["seed_size"], dtext, starts, cnt,
            limit,
        )

    return run


def make_part_locator(stacked: dict, mesh: Mesh, chunk: int):
    """locate() on each part's own device group against its local sampled SA.

    Input: positions/valid [n_parts, chunk] sharded over 'part' (row pi =
    part pi's SA rows).  Output (i1, i2) [n_parts, chunk], part-local
    sequence ids (caller maps to global).  This is the native replacement
    for the replicated-parts CSV fallback (VERDICT r4 task 5)."""
    assert not stacked["light"], "locator needs stack_parts(light=False)"

    def body(blocks, C, strand, sa1, sa2, ind, pos, valid):
        index = DeviceIndex(
            fwd_blocks=blocks[0],
            C=C[0],
            sa_i1=sa1[0],
            sa_i2=sa2[0],
            strand_blocks=strand[0],
            ind_blocks=ind[0],
            seed_mlo=jnp.zeros((1,), _U32),
            seed_size=jnp.zeros((1,), _U32),
            dimer_blocks=jnp.zeros((1, 2), _U32),
            C2=jnp.zeros((16,), _U32),
            has_n=stacked["has_n"],
            sampling=stacked["sampling"],
            n_total=0,
        )
        i1, i2 = locate(index, pos[0], valid[0])
        return i1[None], i2[None]

    sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("part"),) * 6 + (P("part"), P("part")),
        out_specs=(P("part"), P("part")),
        check_vma=False,
    )
    run_jit = jax.jit(sm)

    def run(pos, valid):
        return run_jit(
            stacked["blocks"], stacked["C"], stacked["strand"],
            stacked["sa_i1"], stacked["sa_i2"], stacked["ind"], pos, valid,
        )

    return run
