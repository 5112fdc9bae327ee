"""Part x data sharded execution: index parts across one mesh axis, k-mer
blocks across the other, per-part counts merged on-device with psum.

This is the hg38-and-beyond scale-out story (SURVEY §2.10): a genome whose
both-strand symbol count exceeds uint32 splits into sub-index parts
(index/fmindex.py); on a mesh with axes ('part', 'data') each device group
holds ONE part's rank rows (no replication of the big tables across the part
axis) and a slice of the batch.  Every device searches its local part for its
local blocks; the exact per-part counts are summed with `psum` over the part
axis — riding ICI, never the host.  The reference has no counterpart
(single-node OpenMP); this replaces its shared-memory frequency vector.

CSV/locate is not available in this mode (SA locate needs per-part row
spaces on the host); the engine falls back to the per-part loop for those.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genmap_tpu.ops.rank import DeviceIndex
from genmap_tpu.search.engine import Tier, block_mapper_impl, exact_prefix_steps
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


def stack_parts(data, mesh: Mesh) -> dict:
    """Pad parts to uniform shapes and device_put sharded over 'part'."""
    parts = data.parts
    n_parts = len(parts)
    assert mesh.shape["part"] == n_parts, (
        f"mesh part axis {mesh.shape['part']} != {n_parts} index parts"
    )
    from genmap_tpu.index.fmindex import wide_rows

    nbmax = max(p.fwd.blocks.shape[0] for p in parts)
    ncols = 2 * parts[0].fwd.blocks.shape[1]
    blocks = np.zeros((n_parts, nbmax, ncols), np.uint32)
    for i, p in enumerate(parts):
        blocks[i, : p.fwd.blocks.shape[0]] = wide_rows(np.asarray(p.fwd.blocks))
    C = np.stack([p.C.astype(np.uint32) for p in parts])
    sbmax = max(p.strand_blocks.shape[0] for p in parts)
    strand = np.zeros((n_parts, sbmax, parts[0].strand_blocks.shape[1]), np.uint32)
    for i, p in enumerate(parts):
        strand[i, : p.strand_blocks.shape[0]] = p.strand_blocks
    n_tot = np.array([p.n_total for p in parts], np.uint32)

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    return dict(
        blocks=put(blocks, P("part")),
        C=put(C, P("part")),
        strand=put(strand, P("part")),
        n_tot=put(n_tot, P("part")),
        has_n=data.has_n,
        sampling=data.sampling,
        n_max=max(p.n_total for p in parts),
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
):
    """Part x data sharded block mapper (no CSV states)."""
    o = overlap
    assert o == K - J + 1
    plans = plans_for(errors, o)
    infix_off = K - o
    has_n = stacked["has_n"]
    sampling = stacked["sampling"]
    # conservative: the widest part needs the most exact prefix steps; n_tot
    # is traced inside the shard_map, so the step split is host-static
    ex_steps = exact_prefix_steps(stacked["n_max"])
    Ln = K + J - 1

    def body(blocks, C, strand, n_tot, dtext, starts, cnt, limit):
        from genmap_tpu.ops.rank import extract_needles

        needles = extract_needles(dtext, starts, Ln, limit)
        # local slices carry a leading part axis of length 1
        index = DeviceIndex(
            fwd_blocks=blocks[0],
            C=C[0],
            sa_i1=jnp.zeros((1,), _U32),
            sa_i2=jnp.zeros((1,), _U32),
            strand_blocks=strand[0],
            ind_blocks=jnp.zeros((1, 5), _U32),
            seed_mlo=jnp.zeros((1,), _U32),  # seeding off on the part mesh
            seed_size=jnp.zeros((1,), _U32),
            dimer_blocks=jnp.zeros((1, 2), _U32),  # mono path on the part mesh
            C2=jnp.zeros((16,), _U32),
            has_n=has_n,
            sampling=sampling,
            n_total=0,  # unused: the traced n_tot[0] is passed explicitly
        )
        out = block_mapper_impl(
            index, needles, cnt, n_tot[0], plans=plans, infix_off=infix_off,
            J=J, K=K, tier=tier, errors=errors, cap=cap, rev_compl=rev_compl,
            with_states=False, exact_steps=ex_steps, n_static=stacked["n_max"],
            with_exact=True,
        )
        # exact cross-part merge over ICI: counts add (parts partition the
        # sequence set; matches never cross sentinels).  hits are uint16 on
        # the wire; widen before the sum so per-part caps cannot wrap.
        hits = jnp.minimum(
            jax.lax.psum(out["hits"].astype(_U32), "part"), _U32(cap)
        )
        return dict(
            hits=hits,
            exact_size=jax.lax.psum(out["exact_size"], "part"),
            exact_size_total=jax.lax.psum(out["exact_size_total"], "part"),
            overflow=jax.lax.psum(out["overflow"].astype(jnp.int32), "part") > 0,
            overflow_cap=jax.lax.psum(
                out["overflow_cap"].astype(jnp.int32), "part"
            ) > 0,
        )

    sm = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("part"), P("part"), P("part"), P("part"), P(), P("data"),
            P("data"), P(),
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    run_jit = jax.jit(sm)

    def run(starts, cnt, limit):
        return run_jit(
            stacked["blocks"], stacked["C"], stacked["strand"],
            stacked["n_tot"], dtext, starts, cnt, limit,
        )

    return run
