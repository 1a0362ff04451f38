package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bundled ISO-3166-1 alpha-2 → country-name dimension.
 *
 * Replaces the reference's per-row `pycountry.countries.get(alpha_2=...)` lookups
 * (lambda_function.py:100-101,121) with a ~250-row broadcast dimension table — the
 * lookup becomes a broadcast hash join that Catalyst keeps out of the shuffle path.
 *
 * Divergence (documented, SURVEY.md §7.4): the reference *crashes* on an unknown
 * alpha-2 code (`AttributeError` on `None`, lambda_function.py:101). We reproduce the
 * "unknown ⇒ not counted / not resolvable" effect with an inner join, which drops
 * unknown codes instead of aborting — at 100 TB a single bad row must never kill a job.
 *
 * Names are ASCII-folded ISO-3166 short names (e.g. "Turkiye", "Cote d'Ivoire",
 * "Reunion" without diacritics, and common short forms "Bolivia"/"Venezuela") —
 * a deliberate divergence from pycountry's `.name`, which keeps diacritics and
 * official long forms for a handful of countries. Output strings differ from the
 * reference for those entries; only codes appearing in data ever matter to results.
 */
object Iso3166 {

  /** (alpha2, name) pairs. */
  val entries: Seq[(String, String)] = Seq(
    "AD" -> "Andorra", "AE" -> "United Arab Emirates", "AF" -> "Afghanistan",
    "AG" -> "Antigua and Barbuda", "AI" -> "Anguilla", "AL" -> "Albania",
    "AM" -> "Armenia", "AO" -> "Angola", "AQ" -> "Antarctica", "AR" -> "Argentina",
    "AS" -> "American Samoa", "AT" -> "Austria", "AU" -> "Australia",
    "AW" -> "Aruba", "AX" -> "Aland Islands", "AZ" -> "Azerbaijan",
    "BA" -> "Bosnia and Herzegovina", "BB" -> "Barbados", "BD" -> "Bangladesh",
    "BE" -> "Belgium", "BF" -> "Burkina Faso", "BG" -> "Bulgaria",
    "BH" -> "Bahrain", "BI" -> "Burundi", "BJ" -> "Benin", "BL" -> "Saint Barthelemy",
    "BM" -> "Bermuda", "BN" -> "Brunei Darussalam", "BO" -> "Bolivia",
    "BQ" -> "Bonaire, Sint Eustatius and Saba", "BR" -> "Brazil", "BS" -> "Bahamas",
    "BT" -> "Bhutan", "BV" -> "Bouvet Island", "BW" -> "Botswana",
    "BY" -> "Belarus", "BZ" -> "Belize", "CA" -> "Canada",
    "CC" -> "Cocos (Keeling) Islands", "CD" -> "Congo, The Democratic Republic of the",
    "CF" -> "Central African Republic", "CG" -> "Congo", "CH" -> "Switzerland",
    "CI" -> "Cote d'Ivoire", "CK" -> "Cook Islands", "CL" -> "Chile",
    "CM" -> "Cameroon", "CN" -> "China", "CO" -> "Colombia", "CR" -> "Costa Rica",
    "CU" -> "Cuba", "CV" -> "Cabo Verde", "CW" -> "Curacao",
    "CX" -> "Christmas Island", "CY" -> "Cyprus", "CZ" -> "Czechia",
    "DE" -> "Germany", "DJ" -> "Djibouti", "DK" -> "Denmark", "DM" -> "Dominica",
    "DO" -> "Dominican Republic", "DZ" -> "Algeria", "EC" -> "Ecuador",
    "EE" -> "Estonia", "EG" -> "Egypt", "EH" -> "Western Sahara",
    "ER" -> "Eritrea", "ES" -> "Spain", "ET" -> "Ethiopia", "FI" -> "Finland",
    "FJ" -> "Fiji", "FK" -> "Falkland Islands (Malvinas)",
    "FM" -> "Micronesia, Federated States of", "FO" -> "Faroe Islands",
    "FR" -> "France", "GA" -> "Gabon", "GB" -> "United Kingdom", "GD" -> "Grenada",
    "GE" -> "Georgia", "GF" -> "French Guiana", "GG" -> "Guernsey", "GH" -> "Ghana",
    "GI" -> "Gibraltar", "GL" -> "Greenland", "GM" -> "Gambia", "GN" -> "Guinea",
    "GP" -> "Guadeloupe", "GQ" -> "Equatorial Guinea", "GR" -> "Greece",
    "GS" -> "South Georgia and the South Sandwich Islands", "GT" -> "Guatemala",
    "GU" -> "Guam", "GW" -> "Guinea-Bissau", "GY" -> "Guyana", "HK" -> "Hong Kong",
    "HM" -> "Heard Island and McDonald Islands", "HN" -> "Honduras",
    "HR" -> "Croatia", "HT" -> "Haiti", "HU" -> "Hungary", "ID" -> "Indonesia",
    "IE" -> "Ireland", "IL" -> "Israel", "IM" -> "Isle of Man", "IN" -> "India",
    "IO" -> "British Indian Ocean Territory", "IQ" -> "Iraq",
    "IR" -> "Iran, Islamic Republic of", "IS" -> "Iceland", "IT" -> "Italy",
    "JE" -> "Jersey", "JM" -> "Jamaica", "JO" -> "Jordan", "JP" -> "Japan",
    "KE" -> "Kenya", "KG" -> "Kyrgyzstan", "KH" -> "Cambodia", "KI" -> "Kiribati",
    "KM" -> "Comoros", "KN" -> "Saint Kitts and Nevis",
    "KP" -> "Korea, Democratic People's Republic of", "KR" -> "Korea, Republic of",
    "KW" -> "Kuwait", "KY" -> "Cayman Islands", "KZ" -> "Kazakhstan",
    "LA" -> "Lao People's Democratic Republic", "LB" -> "Lebanon",
    "LC" -> "Saint Lucia", "LI" -> "Liechtenstein", "LK" -> "Sri Lanka",
    "LR" -> "Liberia", "LS" -> "Lesotho", "LT" -> "Lithuania",
    "LU" -> "Luxembourg", "LV" -> "Latvia", "LY" -> "Libya", "MA" -> "Morocco",
    "MC" -> "Monaco", "MD" -> "Moldova, Republic of", "ME" -> "Montenegro",
    "MF" -> "Saint Martin (French part)", "MG" -> "Madagascar",
    "MH" -> "Marshall Islands", "MK" -> "North Macedonia", "ML" -> "Mali",
    "MM" -> "Myanmar", "MN" -> "Mongolia", "MO" -> "Macao",
    "MP" -> "Northern Mariana Islands", "MQ" -> "Martinique", "MR" -> "Mauritania",
    "MS" -> "Montserrat", "MT" -> "Malta", "MU" -> "Mauritius", "MV" -> "Maldives",
    "MW" -> "Malawi", "MX" -> "Mexico", "MY" -> "Malaysia", "MZ" -> "Mozambique",
    "NA" -> "Namibia", "NC" -> "New Caledonia", "NE" -> "Niger",
    "NF" -> "Norfolk Island", "NG" -> "Nigeria", "NI" -> "Nicaragua",
    "NL" -> "Netherlands", "NO" -> "Norway", "NP" -> "Nepal", "NR" -> "Nauru",
    "NU" -> "Niue", "NZ" -> "New Zealand", "OM" -> "Oman", "PA" -> "Panama",
    "PE" -> "Peru", "PF" -> "French Polynesia", "PG" -> "Papua New Guinea",
    "PH" -> "Philippines", "PK" -> "Pakistan", "PL" -> "Poland",
    "PM" -> "Saint Pierre and Miquelon", "PN" -> "Pitcairn", "PR" -> "Puerto Rico",
    "PS" -> "Palestine, State of", "PT" -> "Portugal", "PW" -> "Palau",
    "PY" -> "Paraguay", "QA" -> "Qatar", "RE" -> "Reunion", "RO" -> "Romania",
    "RS" -> "Serbia", "RU" -> "Russian Federation", "RW" -> "Rwanda",
    "SA" -> "Saudi Arabia", "SB" -> "Solomon Islands", "SC" -> "Seychelles",
    "SD" -> "Sudan", "SE" -> "Sweden", "SG" -> "Singapore",
    "SH" -> "Saint Helena, Ascension and Tristan da Cunha", "SI" -> "Slovenia",
    "SJ" -> "Svalbard and Jan Mayen", "SK" -> "Slovakia", "SL" -> "Sierra Leone",
    "SM" -> "San Marino", "SN" -> "Senegal", "SO" -> "Somalia", "SR" -> "Suriname",
    "SS" -> "South Sudan", "ST" -> "Sao Tome and Principe", "SV" -> "El Salvador",
    "SX" -> "Sint Maarten (Dutch part)", "SY" -> "Syrian Arab Republic",
    "SZ" -> "Eswatini", "TC" -> "Turks and Caicos Islands", "TD" -> "Chad",
    "TF" -> "French Southern Territories", "TG" -> "Togo", "TH" -> "Thailand",
    "TJ" -> "Tajikistan", "TK" -> "Tokelau", "TL" -> "Timor-Leste",
    "TM" -> "Turkmenistan", "TN" -> "Tunisia", "TO" -> "Tonga", "TR" -> "Turkiye",
    "TT" -> "Trinidad and Tobago", "TV" -> "Tuvalu",
    "TW" -> "Taiwan, Province of China", "TZ" -> "Tanzania, United Republic of",
    "UA" -> "Ukraine", "UG" -> "Uganda",
    "UM" -> "United States Minor Outlying Islands", "US" -> "United States",
    "UY" -> "Uruguay", "UZ" -> "Uzbekistan", "VA" -> "Holy See (Vatican City State)",
    "VC" -> "Saint Vincent and the Grenadines", "VE" -> "Venezuela",
    "VG" -> "Virgin Islands, British", "VI" -> "Virgin Islands, U.S.",
    "VN" -> "Viet Nam", "VU" -> "Vanuatu", "WF" -> "Wallis and Futuna",
    "WS" -> "Samoa", "YE" -> "Yemen", "YT" -> "Mayotte", "ZA" -> "South Africa",
    "ZM" -> "Zambia", "ZW" -> "Zimbabwe"
  )

  private val byCode: Map[String, String] = entries.toMap

  /** Driver-side lookup (used by report rendering, never in a hot path). */
  def name(alpha2: String): Option[String] = byCode.get(alpha2)

  /** The dimension as a DataFrame(alpha2, country). Always join with
    * `broadcast(...)` — it is ≤250 rows and must never shuffle the fact side. */
  def table(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("alpha2", "country")
  }
}
