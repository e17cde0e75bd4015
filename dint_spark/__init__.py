"""dint_spark — a from-scratch PySpark-native full-text inverted-index
builder and BM25 query engine with the query/data-processing capabilities
of the reference C++ engine jermp/dint (WSDM'19 "Fast Dictionary-based
Compression for Inverted Indexes", ds2i index semantics).

NOT a port: the reference is a single-node mmap'd C++ library; this engine
re-expresses the same semantics Spark-first —

* relational skeleton (postings / docs / vocab / term_meta tables, BM25 as
  native column expressions, top-k as TakeOrderedAndProject) handled by
  Catalyst/AQE;
* the byte-level compression kernels (VByte, DINT dictionary learning +
  optimal-parse encode, decode) as Arrow-vectorized numpy kernels inside
  pandas UDFs;
* the reference's skip structure (per-256-posting block maxima,
  dict_posting_list.hpp:17-19) as plain metadata columns so Catalyst
  min/max + predicate pushdown does the pruning.

Layout:
  session     — SparkSession factory tuned for local[N] testing
  corpus      — deterministic synthetic source-code corpus (input_hint shape)
  tokenizer   — tokenization (native split for word corpora, Arrow UDF for code)
  build/      — docid assignment, postings/docs/vocab/term_meta, blocks
  functions/  — BM25 (bm25.hpp semantics), text-analysis functions
  operators/  — boolean AND/OR, ranked AND/OR, WAND/MaxScore, dedup, ANN
  codecs/     — VByte, DINT (learn/encode/decode), bpi metrics
  index/      — end-to-end index build + decode-on-read
  oracle/     — pure-Python reference engine (queries.hpp semantics)
"""

__version__ = "0.1.0"
