"""Device mesh + sharding helpers — the framework's communication layer.

The reference is single-device (`SURVEY.md` §2.8: no distributed backend);
here every train/extract step is written against a 1-D ``data`` mesh and
jitted with NamedSharding. Under jit, reductions over the batch axis are
*global* (XLA inserts the ICI collectives), so BatchNorm statistics, loss
normalization, and gradient means are exact across chips with no explicit
psum calls. Cross-host scaling is the same mesh built from
``jax.distributed`` global devices.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def get_mesh(devices=None, axis_name=DATA_AXIS):
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def get_mesh_2d(num_model=2, devices=None, data_axis=DATA_AXIS,
                model_axis=MODEL_AXIS):
    """A (data, model) mesh for combined data + tensor parallelism.

    The model axis should map to adjacent devices (fastest ICI links);
    the trailing reshape dimension does exactly that for TPU slices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % num_model == 0, (n, num_model)
    arr = np.asarray(devices).reshape(n // num_model, num_model)
    return Mesh(arr, (data_axis, model_axis))


def tensor_parallel_shardings(tree, mesh, model_axis=MODEL_AXIS,
                              min_cols=None):
    """Shape-based tensor-parallel placement for a param/opt-state tree.

    Shards the trailing (output-feature) dimension of every array whose
    last dim divides evenly over the model axis and is wide enough to be
    worth splitting; everything else (scalars, small heads) replicates.
    Column-sharding every Dense this way is always *correct* — GSPMD
    inserts the all-gathers where a consumer (BatchNorm, the next
    matmul's contraction) needs full rows — and for the wide FC layers
    of the VIPE encoder it keeps both the matmul outputs and the AdamW
    state sharded.
    """
    m = mesh.shape[model_axis]
    if min_cols is None:
        min_cols = 2 * m

    def spec(x):
        shape = getattr(x, 'shape', ())
        if len(shape) >= 1 and shape[-1] % m == 0 and shape[-1] >= min_cols:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [model_axis])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def apply_tensor_parallel(tree, mesh, model_axis=MODEL_AXIS):
    """Device-put a tree with tensor_parallel_shardings placement."""
    return jax.tree_util.tree_map(
        jax.device_put, tree,
        tensor_parallel_shardings(tree, mesh, model_axis))


def batch_sharding(mesh, axis_name=DATA_AXIS):
    """Shard the leading (batch) dim; replicate everything else."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name=DATA_AXIS):
    """Device-put a host batch pytree, sharding dim 0 across the mesh.

    Cross-host (multi-process) meshes: each process passes its LOCAL
    rows — the per-host slice of the global batch, in process order —
    and the result is the assembled global array (the data-parallel
    input pipeline: every host loads only its own shard).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def member_axis_placement(mesh, members, axis_name=DATA_AXIS):
    """Stacked-member fan-out plumbing (fused sweeps/ensembles).

    Fused trainers stack M independent members (trials, folds) on a
    leading axis and shard it over the mesh's data axis. This helper
    owns the shared rules: a mesh is usable only when it is larger than
    one device AND carries the axis; the member list is padded to a
    multiple of the axis size with copies of member 0 (the pad members
    train but are never read back).

    Returns ``(mesh, members, put_m, put_r)``: the normalized mesh (None
    when unusable — callers then run single-device), the padded member
    list, and pytree placement fns (`put_m` shards leaf dim 0 over the
    axis; `put_r` replicates; both plain device_put without a mesh).
    """
    mesh = mesh if (mesh is not None and mesh.size > 1
                    and axis_name in mesh.shape) else None
    members = list(members)
    if mesh is None:
        put = lambda t: jax.tree_util.tree_map(  # noqa: E731
            jax.device_put, t)
        return None, members, put, put
    members += [members[0]] * ((-len(members)) % mesh.shape[axis_name])
    shard_m = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    put_m = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jax.device_put(x, shard_m), t)
    put_r = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jax.device_put(x, repl), t)
    return mesh, members, put_m, put_r


def step_sync_needed(mesh):
    """True when per-step blocking is required for correctness.

    The CPU backend's in-process communicator deadlocks when two
    concurrently in-flight sharded programs interleave their collective
    rendezvous (device threads start program N+1 while others are still
    in N's all-reduce). Real TPU slices execute programs in order, so
    async dispatch with deferred metric readback is safe there — this
    gate serializes steps only on multi-device CPU (tests/dryruns).
    """
    return mesh is not None and mesh.size > 1 \
        and jax.default_backend() == 'cpu'


def replicate(tree, mesh):
    """Device-put a pytree fully replicated across the mesh.

    Multi-process: leaves go through host numpy first — device_put's
    cross-process consistency check rejects process-local device arrays
    even when their values agree."""
    sharding = replicated(mesh)

    def put(x):
        if jax.process_count() > 1:
            x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def pad_batch_to(batch, n, pad_mask_key=None):
    """Pad every leaf's dim 0 to `n` (static shapes => no re-jitting).

    Optionally adds a {pad_mask_key: bool (n,)} marking real rows.
    """
    def pad(x):
        x = np.asarray(x)
        if x.shape[0] == n:
            return x
        pad_width = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width)

    size = len(next(iter(batch.values())))
    out = {k: pad(v) for k, v in batch.items()}
    if pad_mask_key is not None:
        mask = np.zeros(n, dtype=bool)
        mask[:size] = True
        out[pad_mask_key] = mask
    return out


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize cross-host jax.distributed; returns the global mesh.

    On a multi-host slice the same train steps work unchanged: the mesh
    spans all global devices and jit's collectives ride ICI within a
    slice and DCN across slices. No-op on a single process.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return get_mesh()


def is_primary():
    """True on the checkpoint/IO-writing process."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size, mesh=None):
    n = (mesh.size if mesh is not None
         else jax.device_count())
    assert global_batch_size % n == 0, \
        'global batch {} not divisible by {} devices'.format(
            global_batch_size, n)
    return global_batch_size // n
