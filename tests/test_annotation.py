from segma_tpu.annotation import AudioAnnotation


def test_read_line_roundtrip():
    line = "uri_001 1.5 2.25 KCHI"
    a = AudioAnnotation.read_line(line)
    assert a.uid == "uri_001"
    assert a.start_time_s == 1.5
    assert a.duration_s == 2.25
    assert a.label == "KCHI"
    assert a.write() == line


def test_derived_units():
    a = AudioAnnotation("u", 1.0, 0.5, "FEM")
    assert a.end_time_s == 1.5
    assert a.start_time_ms == 1000.0
    assert a.duration_ms == 500.0
    assert a.end_time_ms == 1500.0
    assert a.start_time_f == 16_000
    assert a.duration_f == 8_000
    assert a.end_time_f == 24_000


def test_rttm_roundtrip():
    a = AudioAnnotation("uri_9", 3.125, 0.75, "MAL")
    line = a.to_rttm()
    fields = line.split(" ")
    assert fields[0] == "SPEAKER"
    assert len(fields) == 10
    b = AudioAnnotation.from_rttm(line)
    assert b == AudioAnnotation("uri_9", 3.125, 0.75, "MAL")


def test_from_rttm_nine_fields():
    line = "SPEAKER uri_9 <NA> 3.0 0.5 <NA> <NA> FEM <NA>"
    a = AudioAnnotation.from_rttm(line)
    assert a.uid == "uri_9" and a.label == "FEM"
    assert a.start_time_s == 3.0 and a.duration_s == 0.5
