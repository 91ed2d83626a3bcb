#!/usr/bin/env python3
"""Assemble ingest_drain_r14.json from the raw probe JSON lines.

Inputs (produced by `runMain graft.IngestDrainProbe` under various env):
  /tmp/drain_r14_raw.json        all 5 legs at sf1, 20 batches
  /tmp/drain_r14_sf10_raw.json   ann-only at sf10, 100 batches
  /tmp/drain_r14_ab256k_raw.json text_shingle at sf1 with
                                 SPARK_GRAFT_SEGMENT_ROWS_PER_FILE=256000
Reference for deltas: ingest_drain_r13.json (raw block).
"""
import json, sys

sf1 = json.load(open('/tmp/drain_r14_raw.json'))
sf10 = json.load(open('/tmp/drain_r14_sf10_raw.json'))
ab = json.load(open('/tmp/drain_r14_ab256k_raw.json'))
r13 = json.load(open('ingest_drain_r13.json'))['raw']

def traj(leg, picks=(1, 5, 10, 15, 19)):
    b = leg['batches']
    rows = 0
    out = []
    for r in b:
        if r['b'] in picks:
            out.append({'b': r['b'], 'base': rows, 'reads': r['probe_reads'],
                        'reads_per_base': round(r['probe_reads'] / max(rows, 1), 2),
                        'probe_sec': r['probe_sec'], 'segments': r['segments']})
        rows += r['rows'] - 0  # keepers ~ rows (hit suppression tiny)
    return out

art = {
  'metric': 'ingest_drain_r14',
  'purpose': ('VERDICT r13 #1/#5 + stretches #7/#8: re-drain the ingest indexes after the '
              'adaptive-ANN-family fix, add containment and Zipf legs, extend the ANN leg to '
              'the sf10 corpus (200k vectors, 100 micro-batches) for direct evidence that '
              'per-batch probe reads decouple from the base, and A/B segmentRowsPerFile on the '
              'shingle leg.'),
  'harness': ('graft.IngestDrainProbe, local[32]; sf1 legs = 20 batches over /tmp/graft_sf1 '
              '(50k docs / 20k vectors); sf10 ann leg = 100 batches over /tmp/graft_sf10 '
              '(200k vectors, ~2k rows/batch); per-batch listener recordsRead with settle '
              'polling; probe-then-add with q126/q148 survivor semantics. The sf1 '
              'text_real/text_shingle legs reproduced r13 BYTE-IDENTICAL reads per batch '
              '(deterministic corpus + unchanged code path), so their r13 named causes carry.'),
  'headline': {},
  'named_causes': {},
  'raw_sf1': sf1,
  'raw_sf10_ann': sf10,
  'raw_ab_rows_per_file_256k': ab,
}

# ---- computed summaries -----------------------------------------------------
a14 = sf1['ann']; a13 = r13['ann']
art['headline']['ann_sf1_vs_r13'] = {
  'r13_b19_reads': a13['batches'][19]['probe_reads'],
  'r14_b19_reads': a14['batches'][19]['probe_reads'],
  'note': ('same base (20k vecs), same batch split: r13 read the whole index per batch '
           '(planesPerTable=12 saturated the 41k-key space); r14 per-segment adaptive '
           'families (final merged family 21 planes / 10 tables) cut b19 reads 211k -> 158k '
           'and, unlike r13, the reads are group-pruned scans whose ceiling is set by the '
           'batch, not the base (see ann_sf10).'),
}
s10 = sf10['ann']
art['headline']['ann_sf10'] = {
  'trajectory': traj(s10, picks=(1, 10, 20, 30, 40, 50, 60, 70, 80, 90, 99)),
  'post_full_merge_floors': [
      {'b': 17, 'base_docs': 34000, 'reads': 108554},
      {'b': 38, 'base_docs': 76000, 'reads': 156213},
      {'b': 71, 'base_docs': 142000, 'reads': 293178}],
  'families': s10['families'],
  'note': ('reads/base falls 14.7 -> 3.4 while the base grows 100x (2k -> 198k docs); the '
           'saw-tooth tracks the LSM registry: each full merge (b=17/38/71) drops per-batch '
           'reads to a floor set by the one big re-bucketed segment, and the growth inside a '
           'tooth is the accumulating small (fully-read but small) recent segments, not the '
           'base. The floors grow 108k -> 156k -> 293k, slowing toward the model ceiling '
           'reads ~= tables*groupRows*batchKeys/64 ~= 10*128*20k/64 = 400k rows for a '
           '2k-row batch — BASE-INDEPENDENT (the +6-bit headroom in planes = log2(docs)+6 '
           'holds matched-groups/base constant). r13 design at this point: full-index '
           '~2.2M rows/batch, growing linearly forever. Probe WALL grows 4.5 -> 12s across '
           'the drain: driver-side cost per DISTINCT resident family (one batch '
           'bucketization + one bounded key collect + one ~20k-literal pushed In each, '
           'x up-to-3 families) plus the residual reads — on shared storage reads are the '
           'scaling quantity; the wall cost is bounded by log2(batches) families.'),
}
art['headline']['containment_sf1'] = {
  'build_sec_once': sf1['containment']['build_sec'],
  'probe_sec_band': [min(r['probe_sec'] for r in sf1['containment']['batches'][1:]),
                     max(r['probe_sec'] for r in sf1['containment']['batches'][1:])],
  'reads_band': [min(r['probe_reads'] for r in sf1['containment']['batches'][1:]),
                 max(r['probe_reads'] for r in sf1['containment']['batches'][1:])],
  'note': ('FLAT: per-batch reads 614k-653k with no trend across 20 batches — dominated by '
           'the probe batch\'s OWN token rows (~2.4k docs x ~250 tokens); the frozen bench '
           'index (2.5k docs, built once in 1.08s) contributes the small remainder through '
           'pushed batch-token filters. All 20 probes pushed (visible in the shared '
           'counters, VERDICT r13 #2 closed); zero bloom fp leak at 50k random keys.'),
}
z = sf1['text_zipf']
art['headline']['text_zipf_sf1'] = {
  'hits_total': sum(r['hits'] for r in z['batches']),
  'b19_reads': z['batches'][19]['probe_reads'],
  'vs_text_real_b19': sf1['text_real']['batches'][19]['probe_reads'],
  'note': ('the Zipf vocabulary (200k types, s~1) does what the r13 hypothesis predicted to '
           'CANDIDATE MASS: near-dup hits collapse to ZERO (text_real: ~12k/batch on the '
           '310-token corpus) and the verify scan with them; but probe READS still track the '
           'base (717k at b19 vs text_real 863k) — see named cause.'),
}
art['named_causes']['text_zipf'] = (
  'group-granularity floor, quantified: a 2.5k-doc batch probes ~10-15k distinct rare prefix '
  'tokens; in a Zipf corpus nearly all of them occur SOMEWHERE in the base (rank r appears '
  '~2M/(12.8 r) times at 50k docs), and pref rows are ~16 bytes so a 64KB row group holds '
  '~4k rows — the no-pruning regime lasts until base pref rows exceed probedKeys x '
  'groupRows ~= 15k x 4k = 60M rows (~7M docs). Below that the "full" read is a few MB of '
  'sequential local parquet (wall 3-7s). The crossover is tunable: the ANN buckets cap '
  'groups at 128 rows (crossover ~1.9M pref rows) at the cost of bigger footers; text keeps '
  'byte-sized groups because its probe keys per batch are ~10x the ANN leg\'s and the '
  'index is small enough to read until far past this corpus scale.')
art['named_causes']['ann_fp_leak'] = (
  'fp_leak_rows is now NONZERO (8448 at sf1, 85120 at sf10) and is exactly the designed '
  'bloom fpp surfacing at finer granularity: 128-row groups mean ~1.5k (sf1) / ~15.6k '
  '(sf10) groups; 50k keys x groups x 1e-6 fpp ~= 66 / 665 false-positive group reads x '
  '128 rows = the measured leak to the row. Per real probe (~20k keys) that is ~0.3% of '
  'one batch\'s reads — the bounded storage-for-IO trade the fpp sizing argument made, '
  'now measured at two scales.')

ab_b = ab['text_shingle']['batches']; sh_b = sf1['text_shingle']['batches']
art['headline']['rows_per_file_ab_shingle'] = {
  'default_2m_b19': {'reads': sh_b[19]['probe_reads'], 'probe_sec': sh_b[19]['probe_sec']},
  'ab_256k_b19': {'reads': ab_b[19]['probe_reads'], 'probe_sec': ab_b[19]['probe_sec']},
  'default_total_probe_sec': round(sum(r['probe_sec'] for r in sh_b), 1),
  'ab_total_probe_sec': round(sum(r['probe_sec'] for r in ab_b), 1),
  'note': ('the knob NEVER ENGAGES at this corpus: every shingle segment stays under 256k '
           'rows, so both settings write one file per payload and the drain reproduced '
           'byte-identical reads (2,607,389 at b19) with wall inside the noise band '
           '(default 292.6s vs 290.5s total probe). Measured answer to the r13 stretch question: '
           'rows-per-file serves the MERGE path (write parallelism + file-level range '
           'pruning once segments exceed it); probe-path read amplification is governed by '
           'ROW-GROUP size (parquet.block.size / block.row.count.limit), quantified in the '
           'text_zipf named cause and set explicitly (128 rows) on the ANN buckets.'),
}

json.dump(art, open('ingest_drain_r14.json', 'w'), indent=1)
print('wrote ingest_drain_r14.json')
print('A/B b19 reads: default', sh_b[19]['probe_reads'], 'vs 256k', ab_b[19]['probe_reads'])
print('A/B total probe sec: default', sum(r['probe_sec'] for r in sh_b), 'vs 256k', sum(r['probe_sec'] for r in ab_b))
