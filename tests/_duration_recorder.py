"""One-off pytest plugin: dump per-test call durations to a JSON table.

Usage (regenerates the smoke-tier baseline, tests/durations.json):

    ./run_tests.sh tests/ -q -p tests._duration_recorder \
        --duration-table tests/durations.json

The table maps nodeid -> call-phase seconds and is consumed by
tests/conftest.py's smoke-tier selection.
"""

import json

_durations: dict = {}


def pytest_addoption(parser):
    parser.addoption(
        "--duration-table",
        action="store",
        default=None,
        help="path to write the {nodeid: call_seconds} JSON table",
    )


def pytest_runtest_logreport(report):
    if report.when == "call":
        _durations[report.nodeid] = round(report.duration, 4)


def pytest_sessionfinish(session):
    path = session.config.getoption("--duration-table")
    if path:
        with open(path, "w") as fh:
            json.dump(_durations, fh, indent=0, sort_keys=True)
            fh.write("\n")
