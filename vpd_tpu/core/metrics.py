"""Single-readback metric fetching.

On relay-attached hosts every device->host fetch pays a full round trip
(~26 ms); converting an epoch's worth of step metrics leaf-by-leaf turns
one sync into dozens. `fetch_metrics` packs every leaf of an arbitrary
metrics pytree into ONE flat device vector (one jitted concat, cached
per pytree structure) and slices it back up on host after a single
`np.asarray`.
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack(leaves):
    return jnp.concatenate(
        [jnp.ravel(x).astype(jnp.float32) for x in leaves])


def fetch_metrics(tree):
    """Device metrics pytree -> same pytree of float32 numpy arrays,
    using exactly one device->host transfer."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    if len(leaves) == 1:
        return jax.tree_util.tree_unflatten(
            treedef, [np.asarray(leaves[0])])
    packed = np.asarray(_pack(leaves))
    out = []
    off = 0
    for leaf in leaves:
        shape = getattr(leaf, 'shape', ())
        size = int(np.prod(shape)) if shape else 1
        out.append(packed[off:off + size].reshape(shape))
        off += size
    return jax.tree_util.tree_unflatten(treedef, out)
