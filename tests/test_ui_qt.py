"""Qt demo UI offscreen smoke (reference run_ui.py:253-855): construct
the 3-tab window headless and pump one event-loop pass.  Skips when
PyQt5/cv2 are not in the image (they are optional UI deps)."""
import os

import pytest


@pytest.mark.slow
def test_qt_window_builds_offscreen():
    pytest.importorskip("PyQt5")
    pytest.importorskip("cv2")
    os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")
    from llmvox_tpu.serve.ui import build_qt_window

    app, win = build_qt_window(start_threads=False)
    try:
        tabs = win.centralWidget()
        assert tabs.count() == 3
        assert [tabs.tabText(i) for i in range(3)] == [
            "Text Chat", "Voice Chat", "Visual Chat"]
        win.show()
        app.processEvents()
    finally:
        win.close()
        app.processEvents()
