"""Fixed StructType schemas for the index tables (SURVEY §1.2: ours are static).

Postings row = one (segment, term) inverted list in 128-doc compressed blocks with
block-max metadata (first/last doc, max_freq, min_norm) — the flattened analog of
Lucene's .doc/.pos streams + skip/impact entries (Lucene84PostingsFormat.java:99-103,
Lucene84SkipWriter.java:205-222). Norm bytes are inlined per block (replaces the
separate .nvd norms file) so the query kernel reads one table.
"""

from pyspark.sql import types as T

BLOCK_STRUCT = T.StructType(
    [
        T.StructField("first_doc", T.IntegerType(), False),
        T.StructField("last_doc", T.IntegerType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField("max_freq", T.IntegerType(), False),
        T.StructField("min_norm", T.IntegerType(), False),
        T.StructField("doc_bytes", T.BinaryType(), False),
        T.StructField("freq_bytes", T.BinaryType(), False),
        T.StructField("norm_bytes", T.BinaryType(), False),
        T.StructField("pos_bytes", T.BinaryType(), True),
        # per-position payload channel (.pay analog,
        # Lucene84PostingsFormat.java:99-103); empty when the field has no
        # payloads — old segments without the column read as null
        T.StructField("pay_bytes", T.BinaryType(), True),
        # per-position character-offset channel (offsets ride the same .pay
        # file in Lucene84PostingsFormat.java:99-103; the
        # DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS rung of IndexOptions,
        # demo StartsTest.java); empty / null when offsets are not indexed
        T.StructField("off_bytes", T.BinaryType(), True),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("ttf", T.LongType(), False),
        T.StructField("blocks", T.ArrayType(BLOCK_STRUCT), False),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.IntegerType(), False),
        T.StructField("docid", T.IntegerType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("doclen", T.IntegerType(), False),
        T.StructField("norm_byte", T.IntegerType(), False),
    ]
)

# per-doc term vector intermediate (tokenizer output), pre-explode
TERMVEC_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("freq", T.IntegerType(), False),
            T.StructField("positions", T.ArrayType(T.IntegerType()), False),
        ]
    )
)

# payload-analyzer variant: per-position payloads ride alongside positions
# (PayloadAttribute on the token stream; DelimitedPayloadTokenFilter shape)
TERMVEC_PAY_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("freq", T.IntegerType(), False),
            T.StructField("positions", T.ArrayType(T.IntegerType()), False),
            T.StructField("payloads", T.ArrayType(T.LongType()), False),
        ]
    )
)

# offsets variant: per-position character (start, length) ride alongside
# positions (OffsetAttribute on the token stream; the ...AND_OFFSETS rung)
TERMVEC_OFF_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("freq", T.IntegerType(), False),
            T.StructField("positions", T.ArrayType(T.IntegerType()), False),
            T.StructField("starts", T.ArrayType(T.IntegerType()), False),
            T.StructField("lens", T.ArrayType(T.IntegerType()), False),
        ]
    )
)

STATS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.IntegerType(), False),
        T.StructField("doc_count", T.LongType(), False),   # docs with >=1 token
        T.StructField("sum_ttf", T.LongType(), False),     # sum of doc lengths
        T.StructField("max_doc", T.LongType(), False),     # total rows incl. empty
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("segment_id", T.IntegerType(), False),
        T.StructField("snapshot", T.LongType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)
