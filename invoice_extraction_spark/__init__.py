"""spark-webtext-extract: PySpark-native main-content + structured-field extraction.

A from-scratch reinterpretation (NOT a port) of the reference invoice-field
extraction pipeline (``aasif-10/invoice-extraction``, see SURVEY.md): where the
reference runs one invoice image at a time through OpenCV preprocess -> OCR ->
YOLO -> vision-LLM -> validation (reference: submission/executable.py:54-65),
this engine runs the same extraction *semantics* as vectorized Arrow/pandas UDF
stages over a ``(url, warc_ts, html, text, lang)`` table:

- DOM parse + block segmentation  (analog of the OCR passes, ocr.py:77-132)
- text/link-density boilerplate classification (analog of the YOLO/vision
  region heuristics, vision.py:44-273)
- label-anchor span extraction of invoice-like fields (analog of the
  vision-LLM + regex extractors, extractor.py:12-181 / extractors.py:35-92)
- pure-Column validation + confidence arithmetic (validators.py / confidence.py)

Everything per-document runs inside ``mapInPandas`` / ``pandas_udf`` Arrow
batches — zero per-row Python UDFs. Everything relational is plain DataFrame
API so Catalyst owns pushdown/pruning/join strategy.
"""

__version__ = "0.1.0"
