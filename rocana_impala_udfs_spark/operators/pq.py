"""Product-quantization (PQ) approximate nearest neighbor — the third ANN
family next to hyperplane LSH and IVF (operators/similarity.py), and the
memory-bound production scale path: each vector is stored as M small codes
instead of D floats, and query-time ranking reads ONLY the codes.

Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011), asymmetric distance computation (ADC, their Eq. 12-13):

- the D=64-dim space splits into M=16 subspaces of 4 dims;
- a FROZEN per-subspace codebook (K=16 centroids, trained once by
  tools/gen_pq_codebook.py and committed as literals - the production
  "index as artifact" shape, same contract as similarity.fixed_ivf_centroids
  and tokenizer.FIXED_MERGES) encodes every vector as 16 4-bit codes;
- a probe precomputes its 16x16 table of subspace distances, and a
  database vector's ADC distance is just 16 table lookups summed.

ENGINE-EXACT by construction: vectors quantize to integer micro-units
(floor(x*1e6) - float->double widening and the multiply are exact IEEE
ops, the emb_centroid_microunits idiom), the codebook is integer literals,
so encode argmins (ties -> lowest centroid id via first-match position),
lookup tables, and ADC scores are all exact BIGINT arithmetic - the
ranking hash-matches DuckDB with no float anywhere. Recall against exact
L2 is data-bound (these synthetic embeddings are near-uniform, the
hardest case for any quantizer) and is pinned in pytest with a planted
near-duplicate pair instead; the oracle certifies the ADC algebra.

Scale shape: encoding is ~K*D integer multiply-adds per row in a
vectorized Arrow kernel, zero shuffle (generated JVM expressions were
tried first and blow the whole-stage-codegen method budget into silent
interpreted fallback - the LSH lesson); probes broadcast with their
lookup tables (M*K BIGINTs each); scoring is 16 array lookups summed in
codegen; the only shuffle is the per-probe top-k window - the same plan
shape as the other ANN keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

M_SUBSPACES = 16
K_CENTROIDS = 16
SUB_DIM = 4

# (M=16 subspaces) x (K=16 centroids) x (4 dims), integer micro-units;
# trained once on the sf0.01 corpus (15 Lloyd iterations, deterministic
# first-K init, seedless argmin ties -> lowest id) and FROZEN - the
# production 'index as artifact' shape; regenerate with tools/gen_pq_codebook.py
PQ_CODEBOOK: list[list[list[int]]] = [
    [
        [109376, 34528, 2412, -113402],
        [-189304, 45454, 57136, 28431],
        [37720, 1032, -173718, 109506],
        [-27269, 198306, 5042, 45630],
        [23937, 63143, 150790, 43238],
        [-9043, -149964, 73573, 129724],
        [-81261, 147883, 31196, -151491],
        [245229, -34067, 72786, 12602],
        [-133586, -178298, 33542, -58452],
        [95461, -129624, -64894, -27098],
        [79940, 161016, -211354, -74829],
        [-127551, -23129, -40304, 212090],
        [-34514, -50716, 208203, -88313],
        [68267, 39134, -6085, 143831],
        [-54358, -47817, -37983, -139979],
        [-153840, -29807, -143015, -19605],
    ],
    [
        [182888, -106569, -141712, 18462],
        [-69410, -88089, -162057, 104376],
        [-172398, -41737, 44041, 35142],
        [88492, 5735, 173190, -76507],
        [-31599, -186467, 149753, 108099],
        [128890, -141931, 10033, 139202],
        [-140419, 109782, -144318, -30706],
        [-49988, 43061, 44864, 186900],
        [127879, 148187, 17991, -101402],
        [-37419, 193147, 84004, 35351],
        [-28879, -23042, 30659, -138228],
        [64175, -30092, -144683, -205420],
        [97828, 153734, -205874, -30042],
        [6278, 1562, -41122, 16750],
        [116275, 94434, -64444, 157234],
        [-117849, -233505, -50853, -111403],
    ],
    [
        [199937, 45255, -5916, -3673],
        [-29272, 53454, 50154, 232067],
        [10785, -191278, 37572, 112472],
        [-147880, 158120, -76892, 111730],
        [10370, 160376, 98838, 41798],
        [-107109, 60888, 159934, -53404],
        [88477, 301369, 117992, -8025],
        [-65986, -39782, 22655, 31884],
        [64746, 27020, -148483, 123422],
        [-105698, 35725, -60552, -112217],
        [81724, -104770, -90676, -53940],
        [79492, -21321, 92231, -217865],
        [80636, -60460, 196654, 34886],
        [-75850, -171040, 102679, -141812],
        [33782, 204906, -87180, -93405],
        [-140442, -165443, -115476, 18602],
    ],
    [
        [-183055, -97181, -69109, -28588],
        [98860, -82421, 56655, -75991],
        [-93106, 70710, 54769, 99507],
        [-33780, 249014, 50320, -22399],
        [65399, 57998, 143610, -115766],
        [68079, -73190, -148231, 31425],
        [42038, 137127, -121225, 23107],
        [-147759, -78891, 115532, -107971],
        [5402, -4828, -101579, 211430],
        [-141031, 60792, -155157, -10858],
        [62279, -149434, 29076, 101201],
        [182492, 128322, -22897, 44731],
        [63773, 57705, 161921, 122774],
        [-21635, -262959, -8833, -53665],
        [100352, -174437, 243362, -10594],
        [-35885, 3161, -64466, -180303],
    ],
    [
        [35594, 89537, 32313, 161239],
        [20645, 2838, 151508, -103876],
        [-29900, 114074, -125228, -154359],
        [-54618, -106556, -89348, 130680],
        [133550, 120928, 13425, -65083],
        [145134, -95719, -108114, 53907],
        [-83467, 16116, -160374, -9563],
        [47734, 81186, -166560, 104787],
        [103082, 4170, 209857, 74653],
        [-93446, 244054, 20130, -11014],
        [-86849, 60998, 64127, -110184],
        [117831, -98307, -33855, -131756],
        [-153843, -192464, -93647, -81574],
        [28220, 114554, 27216, -276038],
        [-36830, -120035, 104991, 30029],
        [-162229, 11287, 36122, 46234],
    ],
    [
        [-166549, -43098, -18976, -88984],
        [59654, 198761, 68058, -90456],
        [98270, 39662, 143980, -117297],
        [-36490, -43512, -145133, -47393],
        [-8459, 146389, -49073, 60444],
        [-90650, -106688, 1503, 180150],
        [168182, -39659, -28219, 5519],
        [-42848, 71943, 133005, 39575],
        [67001, -72608, 84448, 48892],
        [24028, 101488, 97940, 232719],
        [-216144, 65121, -1314, 103297],
        [-35229, -122246, 142847, -169400],
        [-101618, 117961, 22292, -176457],
        [122123, -7630, -43956, -238963],
        [103089, 32610, -166640, 110153],
        [-42358, -184466, -4744, 7479],
    ],
    [
        [-37788, 156018, 192597, -59973],
        [115940, 126790, -31585, -129196],
        [-23849, -118403, -128007, -80667],
        [-126863, 1552, -18794, -204845],
        [-20383, -138741, 139883, -49563],
        [126325, -116259, -8225, -27271],
        [-13621, -89797, 29683, 177034],
        [151240, 33486, -101975, 109641],
        [-163613, 153457, 71634, 185215],
        [-51421, -8618, -150834, 69127],
        [73047, 295997, 66276, 38491],
        [162640, 77699, 119622, 21209],
        [-21941, 172789, -141576, 139940],
        [-101373, 11987, 84043, 26840],
        [-245584, -26845, -84406, 7796],
        [-27538, 129866, -61170, -20570],
    ],
    [
        [63062, 116437, 58968, 189680],
        [21523, 209124, -90541, 76816],
        [83458, 100637, -125928, -151387],
        [-234034, 6708, 125107, -69226],
        [111214, -80917, 63595, 92603],
        [-36716, 176197, 50226, -104578],
        [161543, 7115, 47449, -119290],
        [13243, 71723, 204174, 2451],
        [-17858, -270692, -72484, 6437],
        [-54814, -57538, -4338, -148296],
        [-160914, 27659, -168812, -53164],
        [-104908, -23418, -43139, 75723],
        [7486, -156468, 137067, -129883],
        [117333, -111642, -126549, -33845],
        [32599, 9517, -106341, 106882],
        [-91551, -109702, 116000, 111423],
    ],
    [
        [-276444, -70652, 1141, 35236],
        [-44473, -196752, -73316, 10972],
        [-4088, 36815, -143466, 165711],
        [153266, 93782, -104180, -5907],
        [-116878, 18779, 96341, -141724],
        [42452, -79059, -1014, 216592],
        [-91234, 9761, 5729, 114117],
        [-75126, -58299, -71520, -134645],
        [-25360, -81927, 192790, 13995],
        [32621, 115742, 178438, 134758],
        [102074, -103213, 43120, -2521],
        [93619, -117528, -164005, -59764],
        [-78891, 125059, -79125, -33493],
        [136558, 52616, 41001, 52081],
        [74162, 230232, 57826, -29966],
        [124278, -44039, 48911, -208721],
    ],
    [
        [-10718, 5675, 55274, 26049],
        [-100602, -71372, 82195, -181297],
        [90499, 138077, 115590, 19688],
        [102844, -17996, -84511, -124508],
        [-106920, 8957, -94715, -70466],
        [14806, 173800, -159522, -27654],
        [-23871, 156363, 55221, 202515],
        [-63208, -92261, 190262, 70158],
        [93041, -11237, 165116, -108278],
        [-236367, 76196, 48536, 46292],
        [173579, 3275, 17094, 72975],
        [75091, -112916, -242877, 37016],
        [-9017, -6828, -106590, 164394],
        [-33657, 188533, 42134, -124630],
        [49068, -181243, -31287, -32029],
        [-124082, -192534, 14118, 106986],
    ],
    [
        [77546, 130945, -107683, -23612],
        [31709, -94789, 231157, -51891],
        [-134280, 41343, 153541, 31142],
        [-66921, -149577, -94484, 158490],
        [-23589, -32128, -200707, -15579],
        [-54552, 63886, -58073, 53147],
        [140608, -118362, 22708, -22933],
        [-115094, -123320, 76858, 69793],
        [-197914, -22040, -68965, -40464],
        [92176, -14221, 131575, 170520],
        [2488, -213520, -45008, -102017],
        [255481, 86941, -13224, -58923],
        [83110, -1298, -43190, 173166],
        [25515, 7819, -48485, -202467],
        [48815, 120204, 161077, -48331],
        [-86850, 212884, -10883, -77939],
    ],
    [
        [-3075, 131793, 105672, -145004],
        [98479, -63991, 46350, -192290],
        [-74507, 110785, -90967, -165920],
        [146147, 87061, -94480, -28594],
        [-54719, 68248, -157762, 56398],
        [-128231, 22105, 164536, 33255],
        [53302, 173169, 77049, 98245],
        [-56161, 79601, -33568, 276705],
        [145773, -70097, 129366, 17708],
        [-150547, -7310, -17259, 18980],
        [-76377, -136653, 20759, -119416],
        [2553, -107519, -198310, -28129],
        [106837, -45435, -73753, 178260],
        [-253140, 119982, -85817, -15533],
        [-48910, -231319, -27655, 110739],
        [21276, -13256, 20288, 57188],
    ],
    [
        [74911, -209529, -2780, 157236],
        [-73109, -221438, 50131, -65769],
        [122084, -37389, 114616, -49056],
        [255749, -227253, -1058, -26075],
        [-14497, -73119, 36244, 4108],
        [18862, 88210, 79327, 124399],
        [56781, -3083, -124145, 180595],
        [-25088, -101225, 212521, 74381],
        [-180552, -33191, -6489, 160116],
        [40016, 33443, -24481, -208388],
        [48109, 178919, 101621, -47595],
        [168025, 33021, -81030, -46070],
        [-165073, 28125, 100703, -131622],
        [-94974, -90707, -134062, -66594],
        [-145542, 90017, -2187, 16863],
        [-28614, 78183, -145864, -1221],
    ],
    [
        [112687, -107045, 45884, 21339],
        [-48639, 165402, 59323, 129473],
        [53687, -67723, 77367, 183745],
        [44665, 59833, -165289, -32260],
        [-89703, 67042, 212702, 15756],
        [-86271, 75243, -158472, -201440],
        [-7011, 46612, -83343, 159853],
        [-52217, -165636, -154677, 42374],
        [-169898, 46298, 54553, -134936],
        [-206563, -31508, 5036, 45848],
        [177782, 44090, 42187, -36895],
        [24812, 149523, 56737, -82842],
        [175767, -104094, -128333, 4906],
        [-15684, -10219, 17123, -5239],
        [45054, -109300, 176269, -66906],
        [-35218, -145582, -13308, -165386],
    ],
    [
        [27579, -106628, -198802, -80015],
        [124443, -81523, 52455, 162732],
        [12448, -141731, -76484, 133013],
        [-128641, -53615, -8207, -159044],
        [43428, -196417, 30933, -63201],
        [-161972, -14858, 26678, 4278],
        [-54914, 257173, -99027, -22875],
        [15842, 134501, -224286, -129290],
        [-40931, 108742, 84076, -88335],
        [96726, 33258, -11392, -183111],
        [203827, -26023, 3751, 8867],
        [40527, 52954, -58501, 35710],
        [-21269, -70475, 203290, -4394],
        [-69793, 53910, 71516, 164564],
        [-78324, 3182, -195367, 102094],
        [115416, 125954, 178978, 38688],
    ],
    [
        [-110388, -64133, 97709, -191535],
        [-90247, 136681, -142756, -51145],
        [57805, 180713, 32397, 55610],
        [155836, -124224, 24087, -118210],
        [-122262, 20211, 97717, 159331],
        [-109867, 39238, -83063, 120746],
        [44678, 16789, 213762, 2296],
        [45208, 11429, -105513, -178488],
        [-69086, 2280, 27115, -20983],
        [1330, 173449, 31926, -130589],
        [72661, -152308, -72391, 77211],
        [118306, -19930, 18834, 199008],
        [178359, 47223, -37249, -17922],
        [88888, 6777, -195472, 67379],
        [-30513, -175066, 124204, 11842],
        [-130909, -123787, -109335, -40564],
    ],
]


def _quantize(vecs) -> "np.ndarray":
    """Integer micro-unit quantization, identical to both engines' SQL
    form CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT): the Arrow
    float32 -> float64 widening and the 1e6 multiply are the same exact
    IEEE ops (the emb_centroid_microunits idiom)."""
    import numpy as np

    X = np.asarray(vecs.tolist(), dtype=np.float64)
    return np.floor(X * 1000000.0).astype(np.int64)


def _make_codes_udf():
    """PQ encode as an Arrow kernel — exact int64 math, so the result is
    identical to the oracle's generated-SQL argmin (ties -> lowest
    centroid id: np.argmin and list_indexof both take the first minimum).
    A kernel and not a generated JVM expression because 16x16x4 integer
    multiply-adds per row exceed the whole-stage-codegen method budget
    (janino 64KB) and would silently fall back to interpreted evaluation —
    the same lesson as the LSH hyperplane kernels."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def pq_codes(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        Xi = _quantize(vecs)
        B = np.asarray(PQ_CODEBOOK, dtype=np.int64)  # (M, K, SUB)
        out = np.empty((Xi.shape[0], M_SUBSPACES), dtype=np.int32)
        for m in range(M_SUBSPACES):
            S = Xi[:, m * SUB_DIM : (m + 1) * SUB_DIM]
            d = ((S[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
            out[:, m] = d.argmin(axis=1) + 1  # 1-based, ties -> lowest id
        return pd.Series(out.tolist())

    return pq_codes


def _make_tables_udf():
    """Probe-side ADC lookup tables (M x K exact squared distances) as an
    Arrow kernel over the same quantization."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<array<bigint>>")
    def pq_tables(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        Xi = _quantize(vecs)
        B = np.asarray(PQ_CODEBOOK, dtype=np.int64)
        rows = []
        for i in range(Xi.shape[0]):
            t = [
                (((Xi[i, m * SUB_DIM : (m + 1) * SUB_DIM] - B[m]) ** 2).sum(axis=1)).tolist()
                for m in range(M_SUBSPACES)
            ]
            rows.append(t)
        return pd.Series(rows)

    return pq_tables


def pq_adc_topk(
    vectors: DataFrame,
    n_probes: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-``k`` neighbors for the first ``n_probes`` vectors: encode
    the corpus to PQ codes (Arrow kernel, no shuffle), broadcast the
    probes with their precomputed lookup tables, rank by exact integer
    ADC distance (ties -> neighbor id). The score is 16 array lookups
    summed — light enough to stay in whole-stage codegen."""
    codes_udf = _make_codes_udf()
    tables_udf = _make_tables_udf()
    docs = vectors.select(
        F.col(id_col).alias("neighbor_id"), codes_udf(F.col(vec_col)).alias("codes")
    )
    probes = vectors.filter(F.col(id_col) < n_probes).select(
        F.col(id_col).alias("query_id"), tables_udf(F.col(vec_col)).alias("t")
    )
    score = " + ".join(
        f"element_at(element_at(t, {m + 1}), element_at(codes, {m + 1}))"
        for m in range(M_SUBSPACES)
    )
    scored = (
        docs.crossJoin(F.broadcast(probes))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id", f"CAST({score} AS BIGINT) AS adc_score")
    )
    # Per-probe ranking via the two-phase salted top-k: a plain window
    # PARTITION BY query_id sorts the whole corpus in one task per probe
    # at scale; the merge property keeps results identical (VERDICT r7 #2).
    from rocana_impala_udfs_spark.operators.topk import grouped_topk_two_phase

    return grouped_topk_two_phase(
        scored,
        ["query_id"],
        [F.col("adc_score"), F.col("neighbor_id")],
        k,
        salt_col=F.xxhash64("neighbor_id"),
    ).select("query_id", "neighbor_id", "adc_score", F.col("rk").cast("int").alias("rk"))


def pq_adc_oracle_sql(n_probes: int = 4, k: int = 5) -> str:
    """DuckDB twin: the same generated integer expressions (element_at and
    array() translate to list indexing / list_value; argmin via
    list_indexof of the list minimum, also first-match/1-based)."""

    def duck(m: int, xi: str = "xi") -> str:
        terms = []
        for kk in range(K_CENTROIDS):
            c = PQ_CODEBOOK[m][kk]
            parts = []
            for d in range(SUB_DIM):
                i = m * SUB_DIM + d + 1
                parts.append(f"({xi}[{i}] - ({c[d]})) * ({xi}[{i}] - ({c[d]}))")
            terms.append(" + ".join(parts))
        return "[" + ", ".join(terms) + "]"

    codes = ",\n           ".join(
        f"CAST(list_indexof({duck(m)}, list_aggregate({duck(m)}, 'min')) AS INT) AS code_{m}"
        for m in range(M_SUBSPACES)
    )
    tables = ",\n           ".join(f"{duck(m)} AS t_{m}" for m in range(M_SUBSPACES))
    score = " + ".join(f"t_{m}[code_{m}]" for m in range(M_SUBSPACES))
    return f"""
WITH base AS (
    SELECT vec_id AS vid,
           list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS xi
    FROM embeddings
),
docs AS (
    SELECT vid AS neighbor_id,
           {codes}
    FROM base
),
probes AS (
    SELECT vid AS query_id,
           {tables}
    FROM base WHERE vid < {n_probes}
),
scored AS (
    SELECT query_id, neighbor_id, CAST({score} AS BIGINT) AS adc_score
    FROM docs, probes
    WHERE query_id <> neighbor_id
),
rk AS (
    SELECT query_id, neighbor_id, adc_score,
           row_number() OVER (PARTITION BY query_id ORDER BY adc_score, neighbor_id) AS rk
    FROM scored
)
SELECT query_id, neighbor_id, adc_score, CAST(rk AS INT) AS rk
FROM rk WHERE rk <= {k}
"""
