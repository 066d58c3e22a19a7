"""The observability docker profile (reference ships
Grafana+Prometheus over flink-metrics-prometheus; this repo's analog
scrapes Spark's built-in PrometheusServlet) must stay structurally
valid: compose services, scrape endpoints, provisioning wiring, and
the dashboard's metric-name patterns — all checkable without booting
a container."""

from __future__ import annotations

import json
import os

import yaml

DOCKER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docker"
)


def _read_yaml(*parts):
    with open(os.path.join(DOCKER, *parts)) as f:
        return yaml.safe_load(f)


def test_compose_has_obs_profile_services():
    compose = _read_yaml("docker-compose.yml")
    svcs = compose["services"]
    assert {"kafka", "elasticsearch", "prometheus", "grafana"} <= set(svcs)
    for name in ("prometheus", "grafana"):
        assert svcs[name]["profiles"] == ["obs"], name
    # grafana mounts provisioning + dashboards; prometheus its config
    vols = " ".join(svcs["grafana"]["volumes"])
    assert "provisioning" in vols and "dashboards" in vols
    assert any("prometheus.yml" in v for v in svcs["prometheus"]["volumes"])


def test_prometheus_scrapes_both_spark_endpoints():
    prom = _read_yaml("prometheus", "prometheus.yml")
    paths = {sc["metrics_path"] for sc in prom["scrape_configs"]}
    assert paths == {"/metrics/prometheus", "/metrics/executors/prometheus"}


def test_grafana_provisioning_points_at_dashboard_dir():
    ds = _read_yaml("grafana", "provisioning", "datasources", "prometheus.yml")
    assert ds["datasources"][0]["type"] == "prometheus"
    prov = _read_yaml("grafana", "provisioning", "dashboards", "dashboards.yml")
    path = prov["providers"][0]["options"]["path"]
    # the compose file mounts docker/grafana/dashboards at that path
    compose = _read_yaml("docker-compose.yml")
    assert any(
        v.endswith(f":{path}") for v in compose["services"]["grafana"]["volumes"]
    )


def test_dashboard_panels_read_streaming_gauges():
    with open(os.path.join(DOCKER, "grafana", "dashboards", "streaming.json")) as f:
        dash = json.load(f)
    exprs = [t["expr"] for p in dash["panels"] for t in p["targets"]]
    # the gauges spark.sql.streaming.metricsEnabled exposes
    for gauge in (
        "inputRate_total",
        "processingRate_total",
        "latency",
        "states_rowsTotal",
        "eventTime_watermark",
    ):
        assert any(gauge in e for e in exprs), gauge


def test_metrics_properties_enables_prometheus_servlet():
    with open(os.path.join(DOCKER, "metrics.properties")) as f:
        lines = [
            line.strip()
            for line in f
            if line.strip() and not line.strip().startswith("#")
        ]
    props = dict(line.split("=", 1) for line in lines)
    assert (
        props["*.sink.prometheusServlet.class"]
        == "org.apache.spark.metrics.sink.PrometheusServlet"
    )
    assert props["*.sink.prometheusServlet.path"] == "/metrics/prometheus"
