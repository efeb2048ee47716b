"""RLDS/TFDS robot-data pipeline (tf.data on host CPUs feeding TPU).

The reference's pipeline (vla/datasets/rlds/) is already TensorFlow; this
is a slimmed TPU-host rebuild: trajectory chunking, q01/q99 normalization,
frame decode/resize/augment, dataset interleaving with weights, and
per-host sharding (each host reads a disjoint shard — replacing the
reference's per-rank independent shuffles, run_vla_training:274-281).
TFDS dataset builders are required only at the edge (make_dataset_from_rlds)
and are import-gated."""

from mla_tpu.vla.rlds import transforms

__all__ = ["transforms"]
