"""Multi-host (multi-process) training support.

The reference has NO distributed backend (SURVEY.md §2: its only scale-out
is GNU parallel over share-nothing genome chunks). For TPU pods the
framework's training goes multi-controller instead: every host runs the
same `train` command with a coordinator address, JAX's distributed runtime
forms one global device set, and the existing ('data','model') mesh simply
spans it — the jitted train step is already SPMD, so gradients all-reduce
over ICI within a host and DCN across hosts with no further code.

Design invariants (what makes multi-process == single-process):

- Every process iterates the SAME epoch stream (same bin bytes, same
  config.seed -> same deterministic block shuffle) and slices out its own
  row stripe of each global batch, so the global batch composition is
  bit-identical to the single-process run.
- Dropout RNG derives from config.seed identically everywhere; the step is
  one SPMD program, so parameters never diverge.
- Only process 0 writes checkpoints; restore-best keeps an in-memory
  snapshot instead of re-reading from disk so no shared filesystem is
  required.

On CPU (tests, and the driver's virtual-device dryrun) cross-process
collectives use the gloo backend, which jaxlib bundles.
"""

from __future__ import annotations

from typing import Optional


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join the JAX distributed runtime. Must run before the first device
    access. Safe to call once per process."""
    import jax

    # CPU backends need an explicit cross-process collectives implementation;
    # TPU collectives ride the fabric natively. Must be set pre-backend-init.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _collective_barrier()


def _collective_barrier() -> None:
    """Run one tiny all-device collective NOW, while every process is still
    at the same point. The backend's first cross-process collective
    exchanges connection info under a hard ~30 s deadline (gloo KV store);
    deferring it to after the train-step compile lets compile-time skew
    between hosts blow that deadline. After this barrier the processes run
    in lockstep (every step is a collective), so later clique formation
    never sees large skew."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("all",))
    local = np.ones(len(jax.local_devices()), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("all")), local
    )
    total = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(arr)
    assert float(total) == len(devices)


def process_info() -> tuple:
    """(process_index, process_count) — (0, 1) when not distributed."""
    import jax

    return jax.process_index(), jax.process_count()


def check_multihost_mesh(mesh, num_processes: int) -> None:
    """Fail loud on mesh geometries the striped batch placement cannot
    serve. Requirements: every process contributes the same number of
    devices (a prefix mesh from --num_devices would give some process
    zero), each data-row's devices live in ONE process (the model axis
    must not cross hosts), and row ownership ascends by process index
    (so each process's rows form the contiguous stripe local_stripe
    hands it)."""
    import numpy as np

    grid = np.asarray(mesh.devices)
    # orient by NAME: every consumer addresses the mesh by axis name, so a
    # Mesh(..., ('model','data')) must be validated along its data axis,
    # not positionally along axis 0
    names = list(getattr(mesh, "axis_names", ()) or ())
    if "data" in names:
        grid = np.moveaxis(grid, names.index("data"), 0)
    procs = np.asarray([d.process_index for d in grid.flat]).reshape(grid.shape)
    counts = np.bincount(procs.ravel(), minlength=num_processes)
    if set(counts.tolist()) != {grid.size // num_processes}:
        raise ValueError(
            f"multi-host mesh must cover all {num_processes} processes with "
            f"equal device counts; got per-process counts {counts.tolist()} "
            "(don't pass --num_devices smaller than the global device count)"
        )
    row_owner = []
    for row in procs.reshape(grid.shape[0], -1):
        if len(set(row.tolist())) != 1:
            raise ValueError(
                "model_parallel must not cross hosts: a data-row of the mesh "
                f"spans processes {sorted(set(row.tolist()))}"
            )
        row_owner.append(int(row[0]))
    if row_owner != sorted(row_owner):
        raise ValueError(
            f"mesh data-rows must ascend by process index, got {row_owner}"
        )


def local_stripe(n_rows: int, process_id: int, num_processes: int) -> slice:
    """The contiguous row stripe of a global batch owned by this process.

    Valid because make_mesh lays devices out in jax.devices() order, which
    sorts by process index — so a P('data') sharding gives each process a
    contiguous run of rows. n_rows must divide by num_processes (callers
    pad to the data-axis multiple, and the data axis divides by processes).
    """
    assert n_rows % num_processes == 0, (n_rows, num_processes)
    per = n_rows // num_processes
    return slice(process_id * per, (process_id + 1) * per)


def make_global_array(sharding, local_rows):
    """Assemble a global jax.Array from this process's stripe."""
    import jax

    return jax.make_array_from_process_local_data(sharding, local_rows)


def broadcast_checkpoint(init_checkpoint: str, template_params) -> tuple:
    """Multi-host resume: load on process 0, broadcast (params, epoch) to
    every host — non-zero hosts never touch the file (their
    ``init_checkpoint`` string is ignored beyond documentation), so no
    shared filesystem is needed and a stale epoch tail on one host cannot
    desynchronize the epoch counter. A load failure on process 0 is
    broadcast as a flag so every host raises the same error instead of
    the peers hanging inside the collective."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    from clair_tpu.models.checkpoint import epoch_from_path, load_checkpoint

    params, epoch, ok, error = template_params, np.int32(0), np.int32(1), ""
    if jax.process_index() == 0:
        try:
            params, _ = load_checkpoint(init_checkpoint)
            epoch = np.int32(epoch_from_path(init_checkpoint))
        except Exception as exc:  # propagate to ALL hosts, coordinated
            ok, error = np.int32(0), str(exc)
            params = template_params
    bundle = multihost_utils.broadcast_one_to_all(
        {"params": params, "epoch": epoch, "ok": ok}
    )
    if int(bundle["ok"]) == 0:
        raise RuntimeError(
            f"process 0 failed to load {init_checkpoint!r}"
            + (f": {error}" if error else "")
        )
    return jax.tree.map(np.asarray, bundle["params"]), int(bundle["epoch"])


def host_replicated(tree, mesh) -> dict:
    """Pull a (possibly sharded) param/opt pytree to host numpy via a
    replicating jit — works across processes (all-gathers model-sharded
    leaves), so checkpoints and the returned TrainResult hold plain host
    arrays on every host."""
    import jax
    import numpy as np
    from clair_tpu.parallel.sharding import replicate

    rep = jax.jit(
        lambda t: t,
        out_shardings=jax.tree.map(lambda _: replicate(mesh), tree),
    )(tree)
    return jax.tree.map(np.asarray, rep)
