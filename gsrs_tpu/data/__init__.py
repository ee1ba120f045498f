"""Data layer: interaction datasets, normalized bipartite adjacency,
sequence construction, offline builders (i2i, Instacart, MovieLens),
synthetic generators.

TPU-native rebuild of the reference's data layer
(reference code/dataloader.py, code/prepare_instacart.py,
code/preprocess_instacart_i2i.py) as plain value objects + pure
functions instead of torch Dataset subclasses with import-time side
effects (reference code/register.py:35-37)."""
