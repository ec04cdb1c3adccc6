"""Serving tier (S8/S9 routes + F6 auth) over exported artifacts."""

from petfinder_database_distributor_spark.serving.http_server import (  # noqa: F401
    PetServer,
    load_csv_artifact,
    serve_export,
)
