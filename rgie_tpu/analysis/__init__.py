"""Analysis/evaluation suite: VA scoring, low-level metrics, stats tests,
FID/KID/ISC, result processing, image comparison."""

from rgie_tpu.analysis import low_level_metrics
from rgie_tpu.analysis.fid import (
    calculate_metrics,
    fid_from_features,
    inception_score,
    kid_from_features,
)
from rgie_tpu.analysis.predict_va import (
    get_classifier_score_of_images,
    predict_valence_arousal,
)
from rgie_tpu.analysis.process_results import collect_scores, process_result_images
from rgie_tpu.analysis.stats_tests import (
    kruskal_wallis_test,
    one_way_anova,
    one_way_stats_test,
    posthoc_conover,
    posthoc_ttest,
)
