"""The examples/ scripts are product documentation — run each end to end
(tiny step counts) so they can't silently rot as the API evolves."""

import os
import sys

import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


def _run(name: str, *argv: str) -> None:
    import runpy

    old = sys.argv
    sys.argv = [name, *argv]
    try:
        runpy.run_path(os.path.join(_EXAMPLES, name), run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.parametrize("name,args", [
    ("end_to_end.py", ("--steps", "30")),
    ("finetune_and_serve.py", ("--steps", "30")),
    ("robomimic_workflow.py", ("--steps", "30")),
])
def test_example_runs(name, args):
    _run(name, *args)


def test_states_playback_example_runs():
    from test_playback import _egl_available

    if not _egl_available():
        pytest.skip("no headless MuJoCo GL (EGL) available")
    _run("states_playback_workflow.py", "--steps", "30")


def test_predictive_pose_example_runs():
    """The pr5la one-command predictive-pose reproduction (tiny scale):
    flagship scene -> render -> train with target_lookahead=6 -> eval."""
    from test_playback import _egl_available

    if not _egl_available():
        pytest.skip("no headless MuJoCo GL (EGL) available")
    _run("predictive_pose.py", "--demos", "3", "--demo-steps", "12",
         "--steps", "8", "--batch", "4", "--image-hw", "32")
