#!/bin/bash
# Regenerate every results/tpu_* history CSV on the real chip with MEASURED
# cumulative TimeMs (chunked drivers; --timed-chunks -1 = max_iters/5 per
# chunk, so the ~35 ms tunnel round trip per chunk boundary stays a small,
# documented fraction of the measured time). Run from the repo root on TPU.
set -e
R=/root/repo
# SEEDS=N regenerates every row at N init seeds and refreshes each
# directory's multiseed_summary.json (median/min-max ms/iter across the
# Armijo trial-count lottery); the first seed writes the CSVs.
SEEDS="${SEEDS:-1}"
run() {  # run <results_subdir> <run_mnist args...>
  d="$R/results/$1"; shift
  mkdir -p "$d"; cd "$d"
  python "$R/experiments/run_mnist.py" --timed-chunks -1 --record-accuracy \
      --seeds "$SEEDS" "$@"
  python "$R/scripts/plot_results.py" . || true
}
run tpu_mnist_784_128_10        --style cuda --dataset mnist   --iters 1000 --batched-ls --bf16-ring --bf16-grad-input --bf16-prefix --bf16-all --u8-all --warm-alpha
run tpu_mnist_cpu_style_s5000   --style cpu  --dataset mnist   --iters 1000
run tpu_fashion_784_128_10      --style cuda --dataset fashion --iters 1000
run tpu_fashion_cpu_style_s5000 --style cpu  --dataset fashion --iters 500
run tpu_fashion_deep            --style cuda --dataset fashion --iters 1000 --deep --bf16-ring --bf16-grad-input --bf16-prefix --bf16-all --u8-all --warm-alpha
run tpu_fashion_deep_cpu_style  --style cpu  --dataset fashion --iters 500 --deep

# PINN + scaling artifacts (PINN=1 to include; each costs a multi-minute
# remote XLA compile on top of ~1-25 s of device work)
if [ -n "$PINN" ]; then
  mkdir -p "$R/results/tpu_burgers" "$R/results/tpu_oscillator"
  cd "$R/results/tpu_burgers"
  python "$R/experiments/run_burgers.py" --iters 5000
  python "$R/scripts/burgers_validate.py" burgers_test_extrapolation.csv
  python "$R/experiments/run_oscillator.py" --iters 2000 \
      > "$R/results/tpu_oscillator/oscillator_output.txt"
  cd "$R" && python experiments/run_scaling.py \
      > results/scaling_virtual/scaling_tpu_1chip.txt 2>&1
fi
