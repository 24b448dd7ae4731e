set -e
cd "$(dirname "$0")/.."
python train.py -s /tmp/tiny_rich -m /tmp/tiny_run --eval --iterations 50 \
  --interpret --pairs_capacity 65536 --no_viewer \
  --test_iterations 50 --save_iterations 50 --checkpoint_iterations 50 \
  --run_log /tmp/tiny_runlog.jsonl
python scripts/quality_readout.py --model /tmp/tiny_run --data /tmp/tiny_rich \
  --iteration 50 --interpret --mesh_res 128 --mesh_gt_samples 20000
echo TINY_READOUT_OK
