

def test_bucket_half_octave_steps():
    from acoustid_index_tpu.engine.segments import _bucket

    assert _bucket(1, 1024) == 1024
    assert _bucket(1024, 1024) == 1024
    assert _bucket(1025, 1024) == 2048  # 1536 not a multiple of 1024
    assert _bucket(2049, 1024) == 3072  # first half step
    assert _bucket(3073, 1024) == 4096
    assert _bucket(5000, 1024) == 6144
    assert _bucket(7000, 1024) == 8192
    for n in (10_000, 100_000, 5_000_000, 1_200_000_000):
        cap = _bucket(n, 1024)
        assert cap >= n and cap % 1024 == 0
        assert cap <= n * 2  # never more than 2x waste
