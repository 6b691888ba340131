# Connector image — parity with the reference's packaging
# (dockerfile-airbyte-source-shopify:1-10: build the connector, ship a
# runtime whose ENTRYPOINT speaks the Airbyte CLI protocol).
#
# Build:  docker build -t go-integ-spark .
# Spec:   docker run --rm go-integ-spark \
#             go_integ_spark.examples.connectors:shopify spec
# Read:   docker run --rm go-integ-spark \
#             go_integ_spark.examples.connectors:shopify read \
#             --config '{"url": "https://...", "api_key": "..."}'
#
# The Python engine needs no compile stage, so the reference's
# two-stage build collapses to one; the JRE is PySpark's only system
# dependency.
FROM python:3.12-slim-bookworm

# No JAVA_HOME: the package registers java on PATH via alternatives,
# which works on both amd64 and arm64 (a hardcoded
# /usr/lib/jvm/java-17-openjdk-amd64 would break arm64 builds).
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir "pyspark>=4.1" pyarrow pandas numpy

WORKDIR /app
COPY go_integ_spark /app/go_integ_spark
ENV PYTHONPATH=/app

# argv contract (mirrors the reference binary's):
#   <module:source> spec|check|discover|read [--config ...]
#   [--state ...] [--catalog ...] [--format airbyte|singer]
ENTRYPOINT ["python", "-m", "go_integ_spark"]
