"""Fused fast path (stages/fused.py) must be byte-identical to the
Dataset-native assembly path on the same input."""

import glob

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_fused_equals_dataset_path(tmp_path):
    import ray.data

    from doc_parser_ray.pipelines.extraction import extract_transcripts
    from doc_parser_ray.sources.transcripts import write_transcripts
    from doc_parser_ray.stages.fused import fused_extract_assemble

    in_dir = str(tmp_path / "in")
    write_transcripts(in_dir, n_convs=50, seed=13, max_turns=300,
                      num_files=5)
    files = sorted(glob.glob(f"{in_dir}/*.parquet"))

    fused = fused_extract_assemble(
        files, num_partitions=4, salt_bucket_turns=64
    ).to_pandas()
    ref = extract_transcripts(
        ray.data.read_parquet(files), assemble=True, salt_bucket_turns=64,
        num_partitions=4,
    ).to_pandas()

    key = ["conv_id", "turn_idx"]
    f = fused.sort_values(key).reset_index(drop=True)
    r = ref.sort_values(key).reset_index(drop=True)
    assert sorted(f.columns) == sorted(r.columns)
    pd.testing.assert_frame_equal(f[sorted(f.columns)], r[sorted(r.columns)])


@pytest.mark.usefixtures("ray_session")
def test_fused_empty_input(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from doc_parser_ray.datamodel import TRANSCRIPT_SCHEMA
    from doc_parser_ray.stages.fused import fused_extract_assemble

    path = str(tmp_path / "empty.parquet")
    pq.write_table(TRANSCRIPT_SCHEMA.empty_table(), path)
    out = fused_extract_assemble([path], num_partitions=4,
                                 salt_bucket_turns=64)
    assert out.count() == 0
