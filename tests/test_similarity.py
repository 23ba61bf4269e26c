

def test_srp_scale_params_keeps_bucket_occupancy_flat():
    """The scale rule: bits_per_band grows with log2(n), so expected
    rows-per-bucket (n / 2^bits) stays ~constant instead of linear in
    n — the q52 sf1-soak lesson codified."""
    from incubator_gobblin_spark.functions.similarity import (
        srp_scale_params,
    )

    prev_bits = 0
    for n in (1_000, 60_000, 600_000, 6_000_000, 600_000_000):
        num_bits, bands = srp_scale_params(n)
        assert bands == 8
        bpb = num_bits // bands
        assert bpb >= prev_bits  # monotone in n
        prev_bits = bpb
        occupancy = n / (2 ** bpb)
        # stays within ~2x of the 64-row target (ceil granularity)
        assert occupancy <= 128, (n, bpb, occupancy)
    # small corpora keep a sane floor
    assert srp_scale_params(10) == (32, 8)
