"""The user-journey walkthrough (``demo.py``, parity with the
reference's demo/demo.sh + fault-tolerance-demo.sh) must run end-to-end:
create -> insert -> REST job -> SQL -> gRPC bytes -> OCC race -> CHECK
reject -> compaction -> time travel -> RESTORE, exit code 0."""


def test_demo_walkthrough_runs(spark):
    # get_spark() inside main() reuses this session (singleton), so the
    # demo runs in-process against its own throwaway root.
    from mini_lakehouse_control_plane_executor_spark import demo

    assert demo.main() == 0
