from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from bio_re_with_entity_embeddings_ray import quiet_ray_data

    quiet_ray_data()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    from bio_re_with_entity_embeddings_ray.sources.fixtures import write_fixture

    d = tmp_path_factory.mktemp("kgfix")
    write_fixture(str(d), n_convs=200, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def fixture_tables(fixture_dir):
    import pyarrow.parquet as pq

    return (
        pq.read_table(f"{fixture_dir}/transcripts.parquet"),
        pq.read_table(f"{fixture_dir}/annotations.parquet"),
    )
