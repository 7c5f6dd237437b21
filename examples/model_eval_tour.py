"""Model-evaluation & inference-statistics tour — the round-5 science
suite composed as the readout a modeling team runs after an experiment:

  1. fit + generalization: 5-fold CV regression       (q_cv_regression)
  2. robustness: Huber IRLS vs the OLS slope          (q_huber_regression)
  3. uncertainty: split-conformal intervals           (q_conformal_intervals)
  4. discrimination vs calibration: AUC + ECE         (q_roc_auc / q_ece_calibration)
  5. group comparison: Welch t, one-way ANOVA         (q_welch_ttest / q_anova_oneway)
  6. association: Spearman by segment                 (q_spearman_corr)
  7. survival: Kaplan-Meier curve + log-rank test     (q_kaplan_meier / q_log_rank_test)
  8. concentration & seasonality: Gini, ACF, Holt     (q_gini_concentration /
                                                       q_acf_daily_events / q_holt_forecast)

Each stage is the gated query itself — this file only narrates the
composition; correctness lives in the oracle gate (DuckDB twins) and the
independent numpy recomputation tests in tests/.

Run: python examples/model_eval_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m13_sparkstreaming_python_azure_spark.queries.analytics_ext import (
    q_holt_forecast,
)
from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
    q_acf_daily_events,
    q_anova_oneway,
    q_conformal_intervals,
    q_cv_regression,
    q_ece_calibration,
    q_gini_concentration,
    q_huber_regression,
    q_kaplan_meier,
    q_log_rank_test,
    q_roc_auc,
    q_spearman_corr,
    q_welch_ttest,
)
from m13_sparkstreaming_python_azure_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("model-eval-tour")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. generalization: 5-fold CV (train = total - fold) ==")
    q_cv_regression(spark, sf_dir).orderBy("fold").show()

    print("== 2. robustness: Huber IRLS (capped influence) ==")
    q_huber_regression(spark, sf_dir).show()

    print("== 3. uncertainty: split-conformal intervals ==")
    q_conformal_intervals(spark, sf_dir).orderBy("alpha_pct").show()

    print("== 4. discrimination (AUC) vs calibration (ECE) ==")
    q_roc_auc(spark, sf_dir).show()
    q_ece_calibration(spark, sf_dir).orderBy("bin").show()

    print("== 5. group comparison: Welch t and one-way ANOVA ==")
    q_welch_ttest(spark, sf_dir).show()
    q_anova_oneway(spark, sf_dir).show()

    print("== 6. monotone association by segment (Spearman) ==")
    q_spearman_corr(spark, sf_dir).orderBy("segment").show()

    print("== 7. survival: KM curve tail + log-rank group test ==")
    q_kaplan_meier(spark, sf_dir).orderBy("lifetime_days").show(5)
    q_log_rank_test(spark, sf_dir).show()

    print("== 8. concentration, seasonality, forecast ==")
    q_gini_concentration(spark, sf_dir).orderBy("segment").show()
    q_acf_daily_events(spark, sf_dir).orderBy("lag").show(7)
    q_holt_forecast(spark, sf_dir).orderBy("event_type", "h").show(14)

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
