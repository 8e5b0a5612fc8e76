import pytest


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (driver requirement)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_table():
    from pdf_toolkit_ray.sources.fixtures import generate_transcripts_table

    return generate_transcripts_table("smoke")


@pytest.fixture(scope="session")
def smoke_parquet(tmp_path_factory, smoke_table):
    import pyarrow.parquet as pq

    path = tmp_path_factory.mktemp("fixtures") / "transcripts-smoke.parquet"
    pq.write_table(smoke_table, str(path))
    return str(path)
