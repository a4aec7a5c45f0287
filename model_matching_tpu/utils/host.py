"""Batched device->host fetches.

On the tunneled TPU platform, every blocking host read after the
process's FIRST device->host transfer carries a fixed ~25 ms penalty
(the runtime appears to switch from busy-wait to sleep-polled
completion; quantified in scripts/probe_sync_penalty.py). Worse, the
penalty is per *fetch call*, not per sync point: serial ``np.asarray``
/ ``float()`` reads cost ~25-35 ms EACH even on already-computed
buffers, while one ``jax.device_get`` over a pytree of eight arrays
costs ~57 ms total (5.4x cheaper).

Production code therefore batches every group of host reads into ONE
``fetch()`` call. Keep scalars device-side (jnp reductions) until the
group fetch; index device arrays with device indices (``arr[idx_dev]``)
so row reads join the batch instead of forcing an early scalar sync.
"""

import jax


def fetch(tree):
    """One host sync for a whole pytree of device values.

    Returns the pytree with every leaf as a numpy array / scalar.
    ``None`` leaves pass through.
    """
    return jax.device_get(tree)
