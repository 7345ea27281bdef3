"""Large-scale training-data pipeline operators (the north-star
extensions in BASELINE.json, beyond the reference's own surface):

- ``dedup``      : exact, MinHash+LSH, SimHash, n-gram Jaccard and
                   embedding-cosine near-duplicate detection.
- ``similarity`` : similarity search over embeddings — brute-force
                   cosine top-k baseline and the IVF-bucketed scale
                   path.
- ``text``       : language ID, quality scoring, token counting,
                   document fingerprinting.
- ``multimodal`` : opaque binary media columns with typed metadata;
                   decode/feature-extract plumbing over mapInPandas
                   (decoder stubbed — no media libs in the harness).

Design rule shared by every operator here: no driver-side collect, no
cross join without a blocking stage, Python only behind Arrow-batched
Pandas UDFs. Each operator documents its 100 TB plan in its docstring.
"""
