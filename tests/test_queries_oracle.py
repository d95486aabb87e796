"""Driver-gate emulation in pytest: every oracle-paired queries() entry
must match its DuckDB oracle (row count + columns + value hash) at
sf0.001."""

import pytest

from tests import oracle_check

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_all_oracle_paired_queries_match():
    assert oracle_check.run(SF), "oracle mismatch — see stdout"
