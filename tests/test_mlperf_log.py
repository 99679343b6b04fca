"""MLPerf logging contract tests (mlperf_log_utils.py parity)."""

import json

from deepcam_tpu.obs.mlperf_log import MLPerfLogger, parse_mllog


def test_header_and_key_contract(tmp_path):
    log = str(tmp_path / "logs" / "run.log")
    logger = MLPerfLogger(log, "deepcam", "TestOrg", barrier_fn=lambda: None)
    logger.log_start(key="init_start", sync=True)
    logger.log_event(key="seed", value=333)
    logger.log_event(key="global_batch_size", value=16)
    logger.log_end(key="init_stop", sync=True)
    logger.log_start(key="run_start", sync=True)
    logger.log_event(
        key="train_loss", value=0.5, metadata={"epoch_num": 1, "step_num": 10}
    )
    logger.log_end(key="run_stop", sync=True, metadata={"status": "success"})
    logger.close()

    records = parse_mllog(log)
    keys = [r["key"] for r in records]
    # submission header first (mlperf_log_utils.py:55-68)
    assert keys[:5] == [
        "submission_benchmark",
        "submission_org",
        "submission_division",
        "submission_status",
        "submission_platform",
    ]
    by_key = {r["key"]: r for r in records}
    assert by_key["submission_division"]["value"] == "closed"
    assert by_key["submission_status"]["value"] == "onprem"
    assert by_key["seed"]["value"] == 333
    assert by_key["init_start"]["event_type"] == "INTERVAL_START"
    assert by_key["init_stop"]["event_type"] == "INTERVAL_END"
    assert by_key["train_loss"]["event_type"] == "POINT_IN_TIME"
    assert by_key["train_loss"]["metadata"]["step_num"] == 10
    assert by_key["run_stop"]["metadata"]["status"] == "success"
    # every record carries file/lineno metadata and a time_ms
    for r in records:
        assert "file" in r["metadata"] and "lineno" in r["metadata"]
        assert isinstance(r["time_ms"], int)


def test_wire_format_is_mllog(tmp_path):
    log = str(tmp_path / "run.log")
    logger = MLPerfLogger(log, barrier_fn=lambda: None)
    logger.log_event(key="cache_clear")
    logger.close()
    with open(log) as f:
        for line in f:
            assert line.startswith(":::MLLOG ")
            json.loads(line[len(":::MLLOG "):])  # valid JSON payload
