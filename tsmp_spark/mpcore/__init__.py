"""mpcore — pure-numpy matrix-profile kernels (no Spark dependency).

This is the exactness layer (SURVEY.md §7.1): everything here is unit-tested
against brute-force references and the tsmp consistency matrix
(test-stamps.R:101-199), then applied per-series inside Spark pandas UDFs by
``tsmp_spark.operators``.
"""

from .av import (
    av_apply,
    av_complexity,
    av_hardlimit_artifact,
    av_motion_artifact,
    av_stop_word,
    av_zerocrossing,
)
from .discovery import (
    DiscordSet,
    MotifSet,
    find_chains,
    find_discords,
    find_motifs,
    find_motifs_multi,
    find_motifs_valmod,
    min_mp_idx,
    min_mp_idx_multi,
)
from .fluss import (
    arc_counts,
    floss,
    floss_cac,
    floss_extract,
    fluss,
    fluss_cac,
    fluss_extract,
    fluss_score,
)
from .mass import MassPre, dist_profile, mass_pre, mass_pre_weighted, mass_v2, mass_v3, mass_weighted
from .mpdist import SnippetResult, cal_mp_dist, find_snippets, mpdist, mpdist_vect
from .mpx import MpxResult, diag_chunks, merge_partials, mpx, mpx_ab, mpx_partial, partials_to_result
from .mstomp import MultiMatrixProfile, mstomp
from .pmp import PMP, pmp, pmp_upper_bound
from .salient import SalientResult, salient_subsequences, sorted_candidate_idx
from .scrimp import scrimp
from .sdts import SdtsModel, sdts_predict, sdts_score, sdts_train
from .serialize import head_profile, read_profile, subset_profile, tail_profile, write_profile
from .simple import SimpleMatrixProfile, simple_fast
from .valmod import Valmod, valmod
from .stats import (
    EPS,
    EPS_NORM,
    KMODE,
    binary_split,
    complexity,
    corr_ed,
    diff2_lag,
    diff_lag,
    ed_corr,
    exclusion_zone_size,
    fast_avg_sd,
    inner_product,
    ipaa,
    list_to_matrix,
    lowvar_threshold,
    mode,
    movmax,
    movmean,
    movmin,
    movsum,
    muinvn,
    normalize,
    paa,
    r_round,
    sum2s,
    sum_of_squares,
    znorm,
    zero_crossings,
    zero_one_norm,
)
from .stomp import MatrixProfile, stamp, stomp, stompi_update

__all__ = [name for name in dir() if not name.startswith("_")]

from .printing import (  # noqa: E402
    format_arc_count,
    format_chain,
    format_discord,
    format_floss,
    format_fluss,
    format_matrix_profile,
    format_motif,
    format_multi_matrix_profile,
    format_pmp,
    format_salient,
    format_simple_matrix_profile,
    format_snippet,
    format_valmod,
)
