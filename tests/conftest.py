from __future__ import annotations

import pytest

from pdf_table_extractor_spark.session import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
