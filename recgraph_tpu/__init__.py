"""recgraph_tpu — a TPU-native sequence-to-variation-graph alignment engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of RecGraph
(AlgoLab/RecGraph, reference mounted at /root/reference): exact POA,
pathwise, and recombination alignment of reads against GFA variation
graphs, emitting GAF.

Layer map (TPU-first, not a port):

- ``io``       host parsing/serialisation: FASTA, GFA, GAF.
- ``scoring``  dense substitution matrices (replaces HashMap<(char,char),i32>).
- ``graph``    the graph *compiler*: GFA -> dense device arrays
               (linearisation, padded predecessor lists, path bitmasks).
- ``oracle``   NumPy scalar implementations of every DP mode, faithful to
               the reference recurrences cell-by-cell.  These are the
               golden spec the device kernels are tested against, and the
               host-side traceback replayer reuses their emitters.
- ``ops``      JAX / Pallas device kernels (row-scan DP over the graph
               linearisation; the within-row "left" dependency is solved
               with a cummax prefix scan instead of a scalar fixup loop).
- ``align``    batching, bucketing, device dispatch, host traceback.
- ``parallel`` mesh / shard_map read-data-parallelism, multi-host gather.
"""

__version__ = "0.1.0"
