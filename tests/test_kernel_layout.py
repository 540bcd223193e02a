from openllm_ocr_annotator_spark.kernel.layout import parse_layout_lines, segment_layout


def _line(x0, y0, x1, y1, text):
    return f"{x0},{y0},{x1},{y1}\t{text}"


def test_single_region_joined_in_reading_order():
    payload = "\n".join(
        [
            _line(50, 22, 550, 32, "second line"),
            _line(50, 10, 550, 20, "first line"),
        ]
    )
    assert segment_layout(payload) == ["first line second line"]


def test_vertical_gap_splits_regions():
    payload = "\n".join(
        [
            _line(50, 10, 550, 20, "para one a"),
            _line(50, 22, 550, 32, "para one b"),
            _line(50, 80, 550, 90, "para two"),  # gap 48 >> 1.5 * 10
        ]
    )
    assert segment_layout(payload) == ["para one a para one b", "para two"]


def test_same_row_ordered_left_to_right():
    payload = "\n".join(
        [
            _line(300, 10, 550, 20, "right cell"),
            _line(50, 10, 280, 20, "left cell"),
        ]
    )
    assert segment_layout(payload) == ["left cell right cell"]


def test_malformed_lines_skipped():
    payload = "garbage\n1,2,3\tmissing coord\n" + _line(50, 10, 550, 20, "ok")
    assert parse_layout_lines(payload) == [(50.0, 10.0, 550.0, 20.0, "ok")]
    assert segment_layout("") == []
