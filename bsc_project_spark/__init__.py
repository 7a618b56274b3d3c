"""bsc_project_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the computational semantics of the reference pipeline
(rmw874/bsc_project: scanned logbook pages -> segmentation -> per-cell OCR ->
ordered rows) as an idiomatic Spark job over an interleaved text+media
document table:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)
    media(media_ref: string, content: binary, width: int, height: int)

All per-page image work (binarize, margin-crop, segment, post-process,
per-cell OCR decode) runs inside ONE vectorized ``mapInPandas`` stage as pure
numpy kernels (this sandbox has no OpenCV/scipy/PIL/torch — the kernels in
``bsc_project_spark.kernels`` re-implement the required operations from
scratch).  Everything around that stage is plain declarative DataFrame code:
explode, salted repartition, window-based order restoration, lineage, and
checkpoint-resume.

Reference parity is documented per-function via ``/root/reference`` file:line
citations in docstrings.  No code is copied from the reference; it is a
different implementation of the same observable semantics.
"""

__version__ = "0.1.0"
