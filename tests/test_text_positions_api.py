"""GetText/GetPositions parity API (PersistentIndex.cs:93-119)."""

from fulltextsearch_spark.sources.index_io import Index


def test_get_text_byte_identical(spark, pms_index_roots):
    """Extracted/stored text is byte-identical per url (input_hint)."""
    idx = Index.open(spark, pms_index_roots["arrays"])
    assert idx.get_text(5) == (
        "This full-text search only supports boolean operators: and, or"
    )
    assert idx.get_text(1) == "Hello World!"
    assert idx.get_text(999) is None


def test_get_positions_vector(spark, pms_index_roots):
    """Doc 1 'Hello World!': hello at off 0 len 5, world at off 6 len 5
    → flat vector (off+1, off+1+len): [1, 6, 7, 12]."""
    idx = Index.open(spark, pms_index_roots["arrays"])
    assert idx.get_positions(1) == [1, 6, 7, 12]
    assert idx.get_positions(1, field_id=9) is None
